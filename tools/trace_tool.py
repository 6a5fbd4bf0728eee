"""Parse a jax.profiler xplane trace: top device ops by total duration.

Usage: python tools/trace_tool.py <logdir> [top_k]
"""

import sys
from collections import defaultdict
from pathlib import Path


def top_ops(logdir: str, k: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(Path(logdir).rglob("*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(paths[-1].read_bytes())

    rows = []
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps / 1e9  # ms
                agg[name][1] += 1
        total = sum(v[0] for v in agg.values())
        rows.append((plane.name, total, agg))
    for name, total, agg in rows:
        print(f"=== plane {name}: total {total:.1f} ms ===")
        for op, (ms, cnt) in sorted(agg.items(), key=lambda x: -x[1][0])[:k]:
            print(f"  {ms:10.2f} ms  x{cnt:<6} {op[:110]}")
    return rows


if __name__ == "__main__":
    top_ops(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
