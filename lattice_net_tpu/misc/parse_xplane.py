"""Summarize a jax.profiler xplane trace into a per-HLO-op cost table.

The TPU-side ground truth behind the chained stage rows: parses the
``*.xplane.pb`` written by ``profile_forward --trace`` (or any
``jax.profiler.trace`` block) and prints device-time totals per op name.
Parses the XSpace proto directly (the tensorboard_plugin_profile converters
in this image are ABI-incompatible with the installed TF), aggregating
XEvent durations per event-metadata name on each device plane.

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python -m lattice_net_tpu.misc.parse_xplane /tmp/trace_fwd [--top 60]
"""

import argparse
import collections
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--line-filter", default="", help="substring of line name")
    args = ap.parse_args()

    paths = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {args.trace_dir}")
    print(f"xplane: {paths[-1]}")

    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:  # TF moved it; this image has the tsl path
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        is_device = "TPU" in plane.name or "/device:" in plane.name
        if not is_device:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if args.line_filter and args.line_filter not in line.name:
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps
                cnt[name] += 1
            if not tot:
                continue
            total_us = sum(tot.values()) / 1e6
            print(
                f"\n== plane '{plane.name}' line '{line.name}' "
                f"({len(line.events)} events, {total_us:.1f} us total) =="
            )
            print(f"{'us':>12} {'%':>6} {'n':>5}  op")
            for name, ps in tot.most_common(args.top):
                us = ps / 1e6
                print(
                    f"{us:12.1f} {100 * ps / max(sum(tot.values()), 1):6.1f} "
                    f"{cnt[name]:5d}  {name[:150]}"
                )


if __name__ == "__main__":
    main()
