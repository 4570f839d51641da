"""Self-contained XSpace (jax.profiler) trace reader: device-time breakdown.

The reference's only performance instrumentation is wall-clock deltas
(onofftf/utils.py:4-8); on TPU the interesting question is *where the device
program spends its time* (MXU dots vs elementwise fusions vs copies vs the
Pallas custom calls), which lives in the ``.xplane.pb`` files that
``jax.profiler.start_trace`` writes. The TensorBoard profile plugin can't be
imported in this environment (generated-proto / protobuf version mismatch),
so this module decodes the protobuf wire format directly — XSpace is a plain
nested message, and we only need names and durations:

  XSpace{ planes=1 } XPlane{ name=2, lines=3, event_metadata=4(map) }
  XLine{ name=2, events=4 } XEvent{ metadata_id=1, duration_ps=3 }
  XEventMetadata(map entry){ key=1, value=2{ id=1, name=2 } }

Used by ``python -m zigp_tpu.experiments.profile_step``
and ad-hoc: ``summarize_trace(logdir, steps=N)``.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

# ---------------------------------------------------------------- wire format


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message's top level.

    Length-delimited values are returned as raw bytes; varints as ints;
    fixed32/64 as raw bytes (unused here but skipped correctly).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wtype = tag >> 3, tag & 7
        if wtype == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:  # fixed32
            val = buf[pos:pos + 4]
            pos += 4
        elif wtype == 1:  # fixed64
            val = buf[pos:pos + 8]
            pos += 8
        else:  # groups (3/4) never appear in XSpace
            raise ValueError(f"unsupported wire type {wtype}")
        yield field, wtype, val


# ------------------------------------------------------------------- decoding


def _decode_event(buf: bytes) -> Tuple[int, int]:
    """XEvent → (metadata_id, duration_ps)."""
    mid = dur = 0
    for field, _, val in _fields(buf):
        if field == 1:
            mid = val
        elif field == 3:
            dur = val
    return mid, dur


def _decode_line(buf: bytes) -> Tuple[str, List[Tuple[int, int]]]:
    """XLine → (name, [(metadata_id, duration_ps), ...])."""
    name = ""
    events: List[Tuple[int, int]] = []
    for field, _, val in _fields(buf):
        if field == 2:
            name = val.decode("utf-8", "replace")
        elif field == 11 and not name:
            name = val.decode("utf-8", "replace")
        elif field == 4:
            events.append(_decode_event(val))
    return name, events


def _decode_event_metadata(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry → (id, name)."""
    key = 0
    name = ""
    for field, _, val in _fields(buf):
        if field == 1:
            key = val
        elif field == 2:
            for f2, _, v2 in _fields(val):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


class Plane:
    def __init__(self, name: str):
        self.name = name
        self.lines: List[Tuple[str, List[Tuple[int, int]]]] = []
        self.event_names: Dict[int, str] = {}

    def line_totals(self, line_name: str) -> Dict[str, int]:
        """Total duration_ps per event name over all lines matching name."""
        totals: Dict[str, int] = defaultdict(int)
        for lname, events in self.lines:
            if line_name and line_name not in lname:
                continue
            for mid, dur in events:
                totals[self.event_names.get(mid, f"#{mid}")] += dur
        return dict(totals)


def _decode_plane(buf: bytes) -> Plane:
    plane = Plane("")
    for field, _, val in _fields(buf):
        if field == 2:
            plane.name = val.decode("utf-8", "replace")
        elif field == 3:
            plane.lines.append(_decode_line(val))
        elif field == 4:
            key, name = _decode_event_metadata(val)
            plane.event_names[key] = name
    return plane


def load_xspace(path: str) -> List[Plane]:
    with open(path, "rb") as f:
        buf = f.read()
    return [_decode_plane(val) for field, _, val in _fields(buf) if field == 1]


def find_xplane_files(logdir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))


# ------------------------------------------------------------------ summaries

# Categories: collapse XLA's numbered op names ("fusion.123", "copy.5") into
# the op family, and give the Pallas custom-calls their kernel name.
def op_category(name: str) -> str:
    # strip the HLO-text '%' sigil some XLA versions keep in event metadata,
    # so '%fusion.1' and 'fusion.2' land in the same category (and agree
    # with _is_overlapping's classification of the same name)
    base = name.lstrip("%").split(".")[0]
    # jit_<fn>/... hierarchical names: keep the leaf
    if "/" in base:
        base = base.rsplit("/", 1)[-1]
    return base


def summarize_trace(logdir: str, steps: int = 1, device_hint: str = "TPU") -> dict:
    """Aggregate device-plane op time from the newest trace under ``logdir``.

    Returns {"device_plane": str, "total_us": float, "per_step_us": float,
    "by_category": {cat: us}, "by_op": {name: us}} with times in µs for the
    whole traced window (divide by ``steps`` for per-step numbers).
    """
    files = find_xplane_files(logdir)
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    planes: List[Plane] = []
    for path in files[-1:]:
        planes.extend(load_xspace(path))
    def _busy(p: Plane) -> int:
        return sum(dur for _, evs in p.lines for _, dur in evs)

    device = None
    for p in planes:
        if device_hint in p.name and "host" not in p.name.lower():
            device = p
            break
    if device is None:
        # CPU runs have no device plane — take the busiest plane (the XLA
        # client thread line carries the op events there)
        device = max(planes, key=_busy)
    # The per-op line is "XLA Ops" on TPU planes; some backends only have
    # module-level lines, in which case take the busiest line.
    totals = device.line_totals("XLA Ops")
    if not totals:
        # pick the single busiest line — aggregate each line's own events
        # (line_totals substring-matches names, which would merge lines
        # whose names overlap or are empty)
        best: Dict[str, int] = {}
        for _, events in device.lines:
            cand: Dict[str, int] = defaultdict(int)
            for mid, dur in events:
                cand[device.event_names.get(mid, f"#{mid}")] += dur
            if sum(cand.values()) > sum(best.values() or [0]):
                best = dict(cand)
        totals = best
    by_op = {k: v / 1e6 for k, v in totals.items()}  # ps → µs
    # Control/async events OVERLAP the compute they contain or prefetch
    # around (a `while` spans its whole body; an async copy-start's duration
    # spans until its copy-done) — summing them with leaf compute would
    # double-count the window, so report them separately.
    def _is_overlapping(name: str) -> bool:
        base = op_category(name).lstrip("%")
        return (
            base in ("while", "conditional", "call")
            or base.endswith("-start")
            or base.endswith("-done")
            or base.startswith("async")
        )

    compute = {k: v for k, v in by_op.items() if not _is_overlapping(k)}
    overlap = {k: v for k, v in by_op.items() if _is_overlapping(k)}
    by_cat: Dict[str, float] = defaultdict(float)
    for name, us in compute.items():
        by_cat[op_category(name)] += us
    total = sum(compute.values())
    return {
        "device_plane": device.name,
        "total_us": total,
        "per_step_us": total / max(steps, 1),
        "by_category": dict(sorted(by_cat.items(), key=lambda kv: -kv[1])),
        "by_op": dict(sorted(compute.items(), key=lambda kv: -kv[1])),
        "overlapping_us": dict(
            sorted(overlap.items(), key=lambda kv: -kv[1])[:8]
        ),
    }


def format_summary(summary: dict, steps: int, top: int = 12) -> str:
    lines = [
        f"device plane: {summary['device_plane']}",
        f"device time: {summary['total_us']:.1f} µs over {steps} steps "
        f"= {summary['per_step_us']:.2f} µs/step",
        "",
        f"{'category':<28} {'µs/step':>10} {'share':>7}",
    ]
    total = summary["total_us"] or 1.0
    for cat, us in summary["by_category"].items():
        lines.append(f"{cat:<28} {us / steps:>10.2f} {us / total:>6.1%}")
    lines.append("")
    lines.append(f"top {top} compute ops (µs/step):")
    for name, us in list(summary["by_op"].items())[:top]:
        lines.append(f"  {us / steps:>9.2f}  {name[:140]}")
    if summary.get("overlapping_us"):
        lines.append("")
        lines.append("overlapping control/async events (µs/step, span their "
                      "contents — not added to the total):")
        for name, us in summary["overlapping_us"].items():
            lines.append(f"  {us / steps:>9.2f}  {name[:140]}")
    return "\n".join(lines)
