"""Two-parallelism-level scaling benchmark (north rule: ">= 0.8
throughput scaling efficiency between N and 4N executor clusters";
sandbox proxy per BASELINE.md: local[8] vs local[32] on the SAME
input).

Packages gelos_spark into a zip and launches the UNCHANGED flagship
pipeline (jobs/pip_pipeline.py: synth tiles -> JVM cell encode -> PIP
cell-prefix join -> ray-cast tile assignment, checkpointed) twice via

    spark-submit --py-files gelos_spark.zip jobs/pip_pipeline.py

once at --cpus 8 (N) and once at --cpus 32 (4N). Reports tiles/sec at
both levels + scaling efficiency = (tput_4N / tput_N) / 4 into
BENCH/BASELINE.md, and asserts the two runs' outputs are
byte-identical (the exact-match-at-any-parallelism criterion).

Usage: python scripts/scaling_bench.py [--n-tiles 4000000] [--aois 64]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "gelos_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "gelos_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def spark_submit() -> str:
    home = os.environ.get("SPARK_HOME")
    if home:
        cand = os.path.join(home, "bin", "spark-submit")
        if os.path.exists(cand):
            return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    # pip-installed pyspark ships spark-submit next to the package
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def run_level(zpath: str, cpus: int, n_tiles: int, aois: int, out_root: str) -> dict:
    out = os.path.join(out_root, f"cpus{cpus}")
    cmd = [
        spark_submit(),
        "--master",
        f"local[{cpus}]",
        "--py-files",
        zpath,
        os.path.join(REPO, "jobs", "pip_pipeline.py"),
        "--n-tiles",
        str(n_tiles),
        "--aois",
        str(aois),
        "--out",
        out,
        "--cpus",
        str(cpus),
        "--run-id",
        f"scale{cpus}",
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:] + "\n")
        raise SystemExit(f"spark-submit at local[{cpus}] failed")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["cpus"] = cpus
    rec["submit_wall_sec"] = round(wall, 3)
    rec["out"] = out
    return rec


def output_hash(out_dir: str) -> str:
    """Order-independent content hash of the assign stage's committed
    parquet rows (read back, canonically sorted, hashed)."""
    from gelos_spark.session import get_spark
    from gelos_spark.tables.snapshot import SnapshotTable

    spark = get_spark("scaling-verify", cpus=8)
    df = SnapshotTable(os.path.join(out_dir, "assign")).read(spark)
    rows = df.orderBy("aoi_id", "image_id").collect()
    h = hashlib.sha256()
    for r in rows:
        h.update(repr((r.aoi_id, r.image_id, round(r.lon, 9), round(r.lat, 9))).encode())
    return f"{h.hexdigest()} ({len(rows)} rows)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-tiles", type=int, default=4_000_000)
    ap.add_argument("--aois", type=int, default=64)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="gelos_scale_")
    try:
        zpath = build_zip(work)
        lo = run_level(zpath, 8, args.n_tiles, args.aois, work)
        hi = run_level(zpath, 32, args.n_tiles, args.aois, work)

        tput_lo = lo["tiles_per_sec"]
        tput_hi = hi["tiles_per_sec"]
        eff = (tput_hi / tput_lo) / (32 / 8)

        h_lo = output_hash(lo["out"])
        h_hi = output_hash(hi["out"])
        exact = h_lo == h_hi

        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        with open(md, "w") as f:
            f.write(
                f"""# Scaling benchmark — N vs 4N parallelism (north-rule criterion)

No multi-node cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced the way the driver brief prescribes: the SAME
job (`jobs/pip_pipeline.py` — synth tiles -> JVM Morton cell encode ->
PIP cell-prefix join -> exact ray-cast tile assignment, checkpointed
SnapshotTable commits) on the SAME input, launched twice via
`spark-submit --py-files gelos_spark.zip`, at `local[8]` (N) and
`local[32]` (4N).

| setting | value |
|---|---|
| tiles | {args.n_tiles:,} |
| AOI polygons | {args.aois} |
| job | spark-submit --py-files gelos_spark.zip jobs/pip_pipeline.py |

## Results

| parallelism | pipeline wall (s) | throughput (tiles/sec) |
|---|---|---|
| local[8]  (N)  | {lo['elapsed_sec']} | {tput_lo:,.1f} |
| local[32] (4N) | {hi['elapsed_sec']} | {tput_hi:,.1f} |

**Scaling efficiency = (tput_4N / tput_N) / 4 = {eff:.3f}**
(pass threshold: >= 0.8)

## Exact-match at both parallelism levels

Assign-stage output (order-independent sha256 over sorted rows):

- local[8]:  `{h_lo}`
- local[32]: `{h_hi}`
- identical: **{exact}**

## Per-stage seconds

| stage | local[8] | local[32] |
|---|---|---|
"""
            )
            for st in lo["stages"]:
                f.write(f"| {st} | {lo['stages'][st]} | {hi['stages'].get(st, '-')} |\n")
            f.write(
                f"\nAssigned rows: local[8]={lo['assigned_rows']:,}, "
                f"local[32]={hi['assigned_rows']:,}\n"
            )
        print(
            json.dumps(
                {
                    "tput_local8": tput_lo,
                    "tput_local32": tput_hi,
                    "scaling_efficiency": round(eff, 3),
                    "exact_match": exact,
                    "report": md,
                }
            )
        )
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
