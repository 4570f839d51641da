"""utils/xprof.py: the self-contained XSpace trace reader.

Captures a real jax.profiler trace of a tiny jitted function on the test
backend (CPU) and checks the wire-format decoder finds planes, op names, and
nonzero durations — i.e. the `experiments.profile_step` tool's parsing layer works
against whatever xplane schema this jax version writes."""

import jax
import jax.numpy as jnp

from zigp_tpu.utils import xprof


def _capture(tmp_path):
    @jax.jit
    def f(a, b):
        return jnp.tanh(a @ b).sum()

    a = jnp.ones((64, 64))
    f(a, a).block_until_ready()  # compile outside the trace
    logdir = str(tmp_path / "trace")
    jax.profiler.start_trace(logdir)
    try:
        for _ in range(5):
            out = f(a, a)
        out.block_until_ready()
    finally:
        jax.profiler.stop_trace()
    return logdir


def test_xspace_decodes_planes_and_events(tmp_path):
    logdir = _capture(tmp_path)
    files = xprof.find_xplane_files(logdir)
    assert files, "jax.profiler wrote no .xplane.pb"
    planes = xprof.load_xspace(files[-1])
    assert planes and all(p.name for p in planes)
    # some plane carries named events with nonzero durations
    assert any(
        sum(d for _, evs in p.lines for _, d in evs) > 0 and p.event_names
        for p in planes
    )


def test_summarize_trace_reports_ops(tmp_path):
    logdir = _capture(tmp_path)
    summary = xprof.summarize_trace(logdir, steps=5)
    assert summary["total_us"] > 0
    assert summary["by_op"] and summary["by_category"]
    assert summary["per_step_us"] == summary["total_us"] / 5
    # category collapse strips XLA's numeric suffixes
    assert all("." not in c.split("/")[-1] or not c.split(".")[-1].isdigit()
               for c in summary["by_category"])
    text = xprof.format_summary(summary, steps=5)
    assert "µs/step" in text and "category" in text


def test_op_category_collapses_suffixes():
    assert xprof.op_category("fusion.123") == "fusion"
    assert xprof.op_category("copy.5") == "copy"
    assert xprof.op_category("jit_step/convert.8") == "convert"
    assert xprof.op_category("custom-call") == "custom-call"
