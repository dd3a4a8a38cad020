"""Summarize a jax.profiler xplane trace into a per-HLO-op cost table.

The TPU-side ground truth behind the chained stage rows: parses the
``*.xplane.pb`` written by ``profile_forward --trace`` (or any
``jax.profiler.trace`` block) with the locally-installed
``tensorboard_plugin_profile`` converters and prints the top ops by device
time.  No TensorBoard server needed.

    python -m lattice_net_tpu.misc.parse_xplane /tmp/trace_fwd [--top 60]
"""

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--tool", default="hlo_stats")
    args = ap.parse_args()

    paths = sorted(
        glob.glob(
            os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
        )
    )
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {args.trace_dir}")
    print(f"xplane: {paths[-1]}")

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], args.tool + "^", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")

    # hlo_stats ships as gviz JSON ({"cols": [...], "rows": [...]}); fall
    # back to raw dump for other tools
    try:
        tab = json.loads(data)
        cols = [c.get("label") or c.get("id") for c in tab["cols"]]
        rows = [[c.get("v") for c in r["c"]] for r in tab["rows"]]
    except Exception:
        print(data[:4000])
        return

    def col(name_part):
        for i, c in enumerate(cols):
            if c and name_part.lower() in c.lower():
                return i
        return None

    i_time = col("total time") or col("occurrences time") or col("self time")
    i_name = col("hlo op expression") or col("hlo op name") or col("op name")
    i_cat = col("category")
    if i_time is None:
        print("columns:", cols)
        print(rows[:5])
        return
    rows.sort(key=lambda r: -(r[i_time] or 0))
    total = sum(r[i_time] or 0 for r in rows)
    print(f"{'us':>12}  {'%':>5}  op")
    for r in rows[: args.top]:
        t = r[i_time] or 0
        name = str(r[i_name])[:140] if i_name is not None else "?"
        cat = f"[{r[i_cat]}] " if i_cat is not None else ""
        print(f"{t:12.1f}  {100 * t / max(total, 1e-9):5.1f}  {cat}{name}")
    print(f"total device-attributed: {total:.1f} us over {len(rows)} ops")


if __name__ == "__main__":
    main()
