"""Parse a jax.profiler device trace (``*.xplane.pb``) without TensorFlow.

The hosted image ships no ``xplane_pb2`` (tensorboard_plugin_profile has
only the downstream protos), so this is a minimal protobuf wire-format
decoder for the stable XSpace schema subset the perf studies need:

    XSpace.planes[]            (field 1)
    XPlane.name                (2), .lines[] (3),
           .event_metadata{}   (4, map id -> XEventMetadata),
           .stat_metadata{}    (5, map id -> XStatMetadata)
    XLine.name                 (2), .events[] (4)
    XEvent.metadata_id         (1), .duration_ps (3), .stats[] (4)
    XStat.metadata_id          (1), .str_value (5), .ref_value (7)

Usage (drove the per-op tables in docs/PERFORMANCE.md):

    python tools/xplane.py /tmp/trace3d   # dir passed to profiling.trace
"""

from __future__ import annotations

import collections
import glob
import os
import sys
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    r = s = 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_no, wire_type, value) over one message's wire bytes."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _map_entry(buf: bytes) -> Tuple[int, bytes]:
    key, val = 0, b""
    for fno, _, v in fields(buf):
        if fno == 1:
            key = v  # type: ignore[assignment]
        elif fno == 2:
            val = v  # type: ignore[assignment]
    return int(key), bytes(val)


def _name(buf: bytes) -> str:
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            return bytes(v).decode("utf-8", "replace")
    return ""


class Event:
    __slots__ = ("name", "duration_ps", "stats")

    def __init__(self, name: str, duration_ps: int, stats: Dict[str, str]):
        self.name, self.duration_ps, self.stats = name, duration_ps, stats


def parse_xspace(path: str) -> Dict[str, Dict[str, List[Event]]]:
    """{plane_name: {line_name: [Event, ...]}} for every plane/line."""
    raw = open(path, "rb").read()
    out: Dict[str, Dict[str, List[Event]]] = {}
    for fno, wt, plane in fields(raw):
        if fno != 1 or wt != 2:
            continue
        pname, lines, emeta, smeta = "", [], {}, {}
        for f2, w2, v in fields(bytes(plane)):
            if f2 == 2 and w2 == 2:
                pname = bytes(v).decode("utf-8", "replace")
            elif f2 == 3 and w2 == 2:
                lines.append(bytes(v))
            elif f2 == 4 and w2 == 2:
                k, mv = _map_entry(bytes(v))
                emeta[k] = _name(mv)
            elif f2 == 5 and w2 == 2:
                k, mv = _map_entry(bytes(v))
                smeta[k] = _name(mv)
        plane_d: Dict[str, List[Event]] = {}
        for line in lines:
            lname, evs = "", []
            for f3, w3, v in fields(line):
                if f3 == 2 and w3 == 2:
                    lname = bytes(v).decode("utf-8", "replace")
                elif f3 == 4 and w3 == 2:
                    mid = dur = 0
                    stats: Dict[str, str] = {}
                    for f4, w4, ev in fields(bytes(v)):
                        if f4 == 1 and w4 == 0:
                            mid = ev  # type: ignore[assignment]
                        elif f4 == 3 and w4 == 0:
                            dur = ev  # type: ignore[assignment]
                        elif f4 == 4 and w4 == 2:
                            sid, sval = 0, ""
                            for f5, w5, sv in fields(bytes(ev)):
                                if f5 == 1 and w5 == 0:
                                    sid = sv  # type: ignore
                                elif f5 == 5 and w5 == 2:
                                    sval = bytes(sv).decode(
                                        "utf-8", "replace")
                            if sid in smeta and sval:
                                stats[smeta[int(sid)]] = sval
                    evs.append(Event(emeta.get(int(mid), str(mid)),
                                     int(dur), stats))
            plane_d[lname] = evs
        out[pname] = plane_d
    return out


def _bucket(ev: Event) -> str:
    """Classify by opcode, not operand text — same scheme as the 2-D
    study's tables in docs/PERFORMANCE.md."""
    cat = ev.stats.get("hlo_category", "")
    if cat:
        return cat
    op = ev.name.lstrip("%").split(".")[0].split("(")[0]
    return op


def op_buckets(trace_dir: str, line_filter: str = "XLA Ops"):
    """Aggregate (total_ps, events) per bucket over every device plane's
    matching line in the newest xplane.pb under ``trace_dir``."""
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not pbs:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    space = parse_xspace(pbs[-1])
    agg: Dict[str, List[int]] = collections.defaultdict(lambda: [0, 0])
    for pname, lines in space.items():
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        for lname, evs in lines.items():
            # Exact match when filtering for "XLA Ops": substring matching
            # also catches the "Async XLA Ops" line, whose events span
            # start->done of async copies and double-count DMA time.
            if line_filter == "XLA Ops":
                if lname != "XLA Ops":
                    continue
            elif line_filter not in lname:
                continue
            for ev in evs:
                b = agg[_bucket(ev)]
                b[0] += ev.duration_ps
                b[1] += 1
    return {k: (v[0], v[1]) for k, v in agg.items()}


def main(argv: List[str]) -> int:
    buckets = op_buckets(argv[1], argv[2] if len(argv) > 2 else "XLA Ops")
    total = sum(ps for ps, _ in buckets.values())
    print(f"{'bucket':32} {'ms':>10} {'events':>8} {'%':>6}")
    for name, (ps, n) in sorted(
            buckets.items(), key=lambda kv: -kv[1][0]):
        print(f"{name:32} {ps / 1e9:10.3f} {n:8d} "
              f"{100 * ps / max(total, 1):6.1f}")
    print(f"{'TOTAL':32} {total / 1e9:10.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
