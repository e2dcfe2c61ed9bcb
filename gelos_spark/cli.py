"""Command-line entry point: ``python -m gelos_spark run <conf>``.

The reference ships typer CLIs that resolve either one YAML or a
config directory and loop every config through the run function
(gelos/embedding_generation.py:84-121; the transformation CLI repeats
the shape at gelos/embedding_transformation.py:131-174). The engine
analog loops ``plans.config.build_pipeline`` — each config runs with
checkpoint lineage, so re-invoking the CLI resume-skips completed
stages, the reference's ``.embeddings_complete`` marker made
per-stage.

argparse only (no typer in this environment); spark-submit friendly:
``spark-submit --py-files gelos_spark.zip -m`` style launches work
because everything is reached through the package import path.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def resolve_configs(path: str, pattern: str = "*.yaml") -> list[Path]:
    """One YAML file -> [it]; a directory -> every ``pattern`` match
    sorted by name (deterministic loop order, unlike the reference's
    unsorted glob); anything else is an error."""
    p = Path(path)
    if p.is_file():
        return [p]
    if p.is_dir():
        out = sorted(p.glob(pattern))
        if not out:
            raise FileNotFoundError(f"no {pattern} configs in {p}")
        return out
    raise FileNotFoundError(f"config path not found: {p}")


def cmd_run(args: argparse.Namespace) -> int:
    from gelos_spark.plans import config as cfg
    from gelos_spark.session import get_spark

    paths = resolve_configs(args.config, args.pattern)
    spark = get_spark("gelos_spark_cli", cpus=args.cpus)
    try:
        for p in paths:
            conf = cfg.load_config(str(p))
            overrides = {}
            if args.root:
                # a config DIRECTORY under one override root gets a
                # sub-root per config: sharing one root would let
                # same-named stages from different configs overwrite
                # each other's tables while each config's own done
                # markers still claim the stage is complete (a resumed
                # run would then read the OTHER config's data)
                overrides["root"] = (
                    args.root if len(paths) == 1 else f"{args.root}/{p.stem}"
                )
            if args.run_id:
                overrides["run_id"] = args.run_id
            pipe = cfg.build_pipeline(spark, conf, **overrides)
            run_id = overrides.get("run_id") or conf.get("run_id", "run1")
            done = (
                pipe.log.lineage(run_id)
                .where("status = 'done'")
                .select("stage", "rows_out")
                .collect()
            )
            for r in sorted(done, key=lambda r: r.stage):
                print(f"{p.name}\t{r.stage}\t{r.rows_out}")
    finally:
        if args.stop_session:
            spark.stop()
    return 0


def cmd_ops(args: argparse.Namespace) -> int:
    from gelos_spark.plans import config as cfg

    for name in cfg.registered_ops():
        print(name)
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="gelos_spark", description="config-driven pipeline runner"
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run one YAML config or every config in a dir")
    run.add_argument("config", help="YAML file or directory of YAML configs")
    run.add_argument("--pattern", default="*.yaml", help="glob inside a config dir")
    run.add_argument("--root", default=None, help="override the pipeline root dir")
    run.add_argument("--run-id", default=None, help="override the config's run_id")
    run.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    run.add_argument(
        "--keep-session",
        dest="stop_session",
        action="store_false",
        help="leave the SparkSession running (tests reuse it)",
    )
    run.set_defaults(func=cmd_run)

    ops = sub.add_parser("ops", help="list registered pipeline ops")
    ops.set_defaults(func=cmd_ops)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
