"""The shared measurement scaffold (experiments/measure.py) behind the
A/B harnesses: round-robin interleaving, median summary, and the
block-key convention. Uses a fake config/step so it runs in milliseconds
(the real builders are exercised by the harness smoke in their own runs)."""

import json

import numpy as np

from zigp_tpu.experiments import measure


def test_block_key_convention():
    k = np.asarray(measure.block_key(7))
    assert k.dtype == np.uint32 and list(k) == [0, 7]


def test_run_round_robin_interleaves_and_summarizes(monkeypatch, tmp_path):
    built_calls = []
    monkeypatch.setattr(
        measure, "build_config", lambda c: built_calls.append(c) or ("m", c)
    )
    order = []

    def measure_one(built, variant, *, num_inner, num_blocks):
        order.append(variant)
        # distinct, deterministic rates: variant 'b' is always faster
        rate = {"a": 100.0, "b": 200.0}[variant] + len(order)
        return rate, 1.5

    out = tmp_path / "ab.json"
    s = measure.run_round_robin(
        "fake ab", ("cfg1",), ("a", "b"), measure_one,
        num_inner=5, num_blocks=2, repeats=3, out=str(out), log_fn=lambda *_: None,
    )
    assert built_calls == ["cfg1"]  # one build per config, reused across passes
    assert order == ["a", "b", "a", "b", "a", "b"]  # interleaved round-robin
    med = s["steps_per_sec_median"]["cfg1"]
    assert med["b"] > med["a"]
    assert len(s["steps_per_sec_all"]["cfg1"]["a"]) == 3
    assert s["final_block_loss"]["cfg1"]["a"] == [1.5] * 3
    assert json.loads(out.read_text())["task"] == "fake ab"
