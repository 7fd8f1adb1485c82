"""CLI entry point — the ``ray job submit`` target.

Usage (single node; on a cluster drop ``--num-cpus`` and let Ray use it all):

    ray job submit --working-dir . -- \
        python -m deepdoctection_ray.cli extract \
        --input /data/transcripts --output /data/extracted \
        --num-partitions 4096 --resume

    python -m deepdoctection_ray.cli synth --output /tmp/transcripts --n-convs 1000
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="deepdoctection_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ex = sub.add_parser("extract", help="run the checkpointed extraction pipeline")
    p_ex.add_argument("--input", required=True)
    p_ex.add_argument("--output", required=True)
    p_ex.add_argument("--num-partitions", type=int, default=256)
    p_ex.add_argument("--resume", action="store_true", default=True)
    p_ex.add_argument("--no-resume", dest="resume", action="store_false")
    p_ex.add_argument("--num-cpus", type=int, default=None,
                      help="local-mode CPU count; omit on a real cluster")

    p_an = sub.add_parser("analyze", help="flagship analyze: PDF file/dir or transcript dir")
    p_an.add_argument("--path", required=True)
    p_an.add_argument("--output", default=None, help="parquet output dir (default: print row count)")
    p_an.add_argument("--config", action="append", default=[], metavar="KEY=VALUE",
                      help="config overwrite, repeatable (e.g. USE_LANGUAGE_DETECTION=True)")
    p_an.add_argument("--num-cpus", type=int, default=None)

    p_sy = sub.add_parser("synth", help="generate a synthetic transcript corpus")
    p_sy.add_argument("--output", required=True)
    p_sy.add_argument("--n-convs", type=int, default=1000)
    p_sy.add_argument("--seed", type=int, default=42)
    p_sy.add_argument("--scale", type=int, default=1)
    p_sy.add_argument("--num-cpus", type=int, default=None)

    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    try:
        if args.cmd == "extract":
            from .pipelines.extraction import run_extraction

            summary = run_extraction(
                args.input, args.output, num_partitions=args.num_partitions, resume=args.resume
            )
            print(json.dumps(summary))
        elif args.cmd == "analyze":
            from .analyzer import get_analyzer

            ds = get_analyzer(args.config or None).analyze(args.path)
            if args.output:
                ds.write_parquet(args.output)
                print(json.dumps({"output": args.output}))
            else:
                df = ds.to_pandas()
                print(json.dumps({"rows": len(df), "columns": list(df.columns)}))
        elif args.cmd == "synth":
            from .synth import write_transcripts

            path = write_transcripts(
                args.output, n_convs=args.n_convs, seed=args.seed, scale=args.scale
            )
            print(json.dumps({"output": path}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
