"""Parse a jax.profiler xplane.pb: per-line totals, then op aggregation for
the chosen line (default: the line with the most events)."""
import sys, glob, collections
from tensorflow.tsl.profiler.protobuf import xplane_pb2

root = sys.argv[1]
want_line = sys.argv[2] if len(sys.argv) > 2 else None
paths = glob.glob(root + "/**/*.xplane.pb", recursive=True)
for path in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        print(f"== plane {plane.name}")
        ev_meta = plane.event_metadata
        best, best_n = None, -1
        for line in plane.lines:
            n = len(line.events)
            tot = sum(e.duration_ps for e in line.events) / 1e9
            print(f"  line '{line.name}' (id {line.id}): {n} events, {tot:.1f} ms")
            if want_line and line.name == want_line:
                best = line
            elif not want_line and n > best_n:
                best, best_n = line, n
        if best is None:
            continue
        print(f"-- aggregating line '{best.name}'")
        agg, cnt = collections.Counter(), collections.Counter()
        for ev in best.events:
            name = ev_meta[ev.metadata_id].name
            agg[name] += ev.duration_ps / 1e9
            cnt[name] += 1
        print(f"   total {sum(agg.values()):.1f} ms")
        for name, ms in agg.most_common(45):
            print(f"  {ms:9.2f} ms  x{cnt[name]:5d}  {name[:130]}")
