"""Aggregate per-op device time from a jax.profiler xplane.pb capture.

tensorboard_plugin_profile's converters need a matching TF protobuf stack
(not in this image), so this is a minimal wire-format walker for the
stable XSpace/XPlane/XLine/XEvent schema — enough to rank XLA/Mosaic ops
by total device time, which is all the fusion work needs.

Usage:
    python tools/xplane_stats.py <trace.xplane.pb> [top_n] [--csv out.csv]

Schema walked (tsl/profiler/protobuf/xplane.proto):
    XSpace.planes=1 -> XPlane{name=2, lines=3, event_metadata=4(map)}
    XLine{name=2, events=6} -> XEvent{metadata_id=1, duration_ps=3,
                                      num_occurrences=5}
    XEventMetadata map entry {key=1, value=2->{id=1, name=2}}
"""

import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<I", buf[i:i + 4])[0]
            i += 4
        elif wt == 1:
            v = struct.unpack("<Q", buf[i:i + 8])[0]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, v


def parse_plane(buf):
    name = ""
    meta = {}
    lines = []
    for fnum, _, v in fields(buf):
        if fnum == 2:
            name = v.decode("utf-8", "replace")
        elif fnum == 4:  # map<int64, XEventMetadata>
            k = None
            mname = None
            for f2, _, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    for f3, _, v3 in fields(v2):
                        if f3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if k is not None:
                meta[k] = mname or f"<{k}>"
        elif fnum == 3:
            lines.append(v)
    return name, meta, lines


def parse_line(buf):
    lname = ""
    events = []
    for fnum, wt, v in fields(buf):
        if fnum == 2 and wt == 2:
            lname = v.decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:  # repeated XEvent events = 4
            mid = 0
            dur = 0
            occ = 1
            for f2, _, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
                elif f2 == 5:
                    occ = v2
            events.append((mid, dur, occ))
    return lname, events


def plane_stats(path, plane_filter=("TPU", "/device", "Device")):
    """Returns {plane_name: {op_name: (total_ps, count)}} for device planes."""
    with open(path, "rb") as f:
        space = f.read()
    out = {}
    for fnum, _, v in fields(space):
        if fnum != 1:
            continue
        pname, meta, lines = parse_plane(v)
        if plane_filter and not any(s in pname for s in plane_filter):
            continue
        agg = defaultdict(lambda: [0, 0])
        for lb in lines:
            lname, events = parse_line(lb)
            for mid, dur, occ in events:
                name = meta.get(mid, f"<{mid}>")
                a = agg[name]
                a[0] += dur
                a[1] += max(occ, 1)
        if agg:
            out[pname] = {k: (v0, c) for k, (v0, c) in agg.items()}
    return out


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 60
    stats = plane_stats(path)
    if not stats:
        stats = plane_stats(path, plane_filter=None)
        print("(no TPU/device plane matched; showing all planes)")
    for pname, agg in stats.items():
        total_ps = sum(v for v, _ in agg.values())
        n_ops = sum(c for _, c in agg.values())
        print(f"\n== plane: {pname}  total {total_ps/1e9:.3f} ms, "
              f"{len(agg)} op types, {n_ops} executions ==")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
        for name, (ps, cnt) in rows[:top_n]:
            print(f"{ps/1e9:10.4f} {100*ps/max(total_ps,1):6.2f} {cnt:7d}  "
                  f"{name[:110]}")


if __name__ == "__main__":
    main()
