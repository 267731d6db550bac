"""Job entry point: run the extraction + correction pipeline over an
interleaved-document table and write partitioned parquet output.

Designed for ``ray job submit -- python -m ocr_corrector_ray.cli ...``;
also runnable directly.  This is the only module (besides bench.py and the
test fixture) that owns a Ray session.

Examples:
    python -m ocr_corrector_ray.cli --input /tmp/corpus.parquet --output /tmp/out
    python -m ocr_corrector_ray.cli --gen-docs 1000 --output /tmp/out --mode fused
    python -m ocr_corrector_ray.cli --gen-docs 1000 --output /tmp/mf --stage media-features
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def output_clear_guard(output: str, src: str) -> str | None:
    """Safety check before the overwrite path unlinks ``*.parquet`` under
    ``output``: refuse when the input lies under the output (the clear
    would delete input data before the lazy pipeline reads it) or when
    the directory holds a checkpoint manifest (the clear would delete
    the checkpoint's fragments while the manifest survives, corrupting
    resume/readback).  Returns an error message, or None when safe."""
    out_real = os.path.realpath(output)
    src_real = os.path.realpath(src)
    if os.path.commonpath([out_real, src_real]) == out_real:
        return (f"input {src} lies under output {output}; refusing to "
                "clear it")
    if os.path.exists(os.path.join(output, "manifest")) or \
            os.path.exists(os.path.join(output, "manifest.json")):
        return (f"{output} holds a checkpoint manifest; rerun with "
                "--checkpoint to resume it (refusing to clear "
                "checkpointed output)")
    return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="parquet file/dir with the interleaved-doc schema")
    ap.add_argument("--gen-docs", type=int, default=0,
                    help="generate a synthetic corpus of N docs instead of --input")
    ap.add_argument("--output", help="output directory (parquet)")
    ap.add_argument("--mode", choices=["explode", "fused", "hybrid", "delta"],
                    default="explode",
                    help="physical plan; 'delta' needs a bucketized input "
                         "(--bucketize-to layout) and ships only changed "
                         "spans across the shuffle")
    ap.add_argument("--stage", default="correct",
                    help="pipeline to run: the extraction+correction flagship "
                         "(default), a multimodal stage (media-features, "
                         "media-resize, media-frame-sample, media-audio) over "
                         "the same interleaved-doc input, or query:<name> to "
                         "run any driver-registry query (see "
                         "__ray_entry__.queries()) over --sf-dir and write "
                         "its result as parquet")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="testdata table directory for --stage query:<name>")
    ap.add_argument("--span-threshold", type=int, default=4096,
                    help="hybrid-mode routing bound: docs with more spans than "
                         "this take the explode/shuffle path")
    ap.add_argument("--checkpoint", action="store_true",
                    help="resumable run: per-partition fragments + lineage manifest "
                         "under --output; rerun skips completed partitions "
                         "(whole input files are pruned when the input is a "
                         "--bucketize-to layout)")
    ap.add_argument("--bucketize-to", metavar="DIR",
                    help="re-lay the input out bucketed by hash(doc_id) %% "
                         "--num-partitions into DIR (enables file-level resume "
                         "pruning), then exit")
    ap.add_argument("--num-partitions", type=int, default=32)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 0)) or None)
    ap.add_argument("--concurrency", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    _MEDIA_STAGES = ("media-features", "media-resize", "media-frame-sample",
                     "media-audio")
    is_query = args.stage.startswith("query:")
    if args.stage != "correct" and args.stage not in _MEDIA_STAGES and not is_query:
        ap.error(f"unknown --stage {args.stage!r} (correct, "
                 f"{', '.join(_MEDIA_STAGES)}, or query:<name>)")
    if not is_query and not args.input and not args.gen_docs:
        ap.error("one of --input or --gen-docs is required")
    if not args.output and not args.bucketize_to:
        ap.error("--output is required (unless --bucketize-to)")

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from . import datagen
        from .pipelines.correct import corrected_dataset

        if args.input:
            src = args.input
            if not os.path.exists(src):
                print(f"error: input not found: {src}", file=sys.stderr)
                return 2
        elif args.gen_docs:
            src = datagen.corpus_path(args.gen_docs, seed=args.seed)
        else:
            src = args.sf_dir  # query stage: tables come from --sf-dir

        t0 = time.perf_counter()
        if args.bucketize_to:
            from .state.checkpoint import bucketize_input

            bucketize_input(src, args.bucketize_to, args.num_partitions)
            print(json.dumps({
                "input": src, "bucketized_to": args.bucketize_to,
                "num_partitions": args.num_partitions,
                "wall_s": round(time.perf_counter() - t0, 3),
            }))
            return 0
        if is_query:
            # the registry lives in the repo-root driver-contract module;
            # resolvable when the CLI runs from the repo root (the `ray
            # job submit` working-dir layout)
            import importlib

            try:
                entry = importlib.import_module("__ray_entry__")
            except ImportError:
                print("error: __ray_entry__ not importable — run from the "
                      "repo root", file=sys.stderr)
                return 2
            qname = args.stage.split(":", 1)[1]
            registry = entry.queries()
            if qname not in registry:
                print(f"error: unknown query {qname!r}; available: "
                      f"{', '.join(sorted(registry))}", file=sys.stderr)
                return 2
            res = registry[qname](args.sf_dir)
            if os.path.isdir(args.output):
                err = output_clear_guard(args.output, args.sf_dir)
                if err is not None:
                    print(f"error: {err}", file=sys.stderr)
                    return 2
                for r, _, fs in os.walk(args.output):
                    for f in fs:
                        if f.endswith(".parquet"):
                            os.unlink(os.path.join(r, f))
            if isinstance(res, ray.data.Dataset):
                res.write_parquet(args.output)
                n_rows = ray.data.read_parquet(args.output).count()
            else:
                # small pandas / pyarrow results: one file, same contract
                import pyarrow as pa
                import pyarrow.parquet as pq

                tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
                os.makedirs(args.output, exist_ok=True)
                pq.write_table(tbl, os.path.join(args.output, "part-0.parquet"))
                n_rows = tbl.num_rows
            wall = time.perf_counter() - t0
            print(json.dumps({
                "query": qname, "sf_dir": args.sf_dir, "output": args.output,
                "rows": n_rows, "wall_s": round(wall, 3),
                "rows_per_s": round(n_rows / wall, 2) if wall > 0 else None,
            }))
            return 0
        if args.stage != "correct":
            from .stages import media as mediamod

            build = {
                "media-features": mediamod.media_features,
                "media-resize": mediamod.media_resize,
                "media-frame-sample": mediamod.media_frame_sample,
                "media-audio": mediamod.media_audio_features,
            }[args.stage]
            if args.checkpoint:
                from .state.checkpoint import read_stage_output, run_stage_checkpointed

                manifest = run_stage_checkpointed(
                    src, args.output, build, num_partitions=args.num_partitions,
                )
                wall = time.perf_counter() - t0
                n_rows = read_stage_output(args.output).count()
                print(json.dumps({
                    "input": src, "output": args.output, "stage": args.stage,
                    "mode": "checkpointed", "rows": n_rows,
                    "partitions": manifest.num_rows,
                    "wall_s": round(wall, 3),
                    "rows_per_s": round(n_rows / wall, 2) if wall > 0 else None,
                }))
                return 0
            ds = build(ray.data.read_parquet(src))
            if os.path.isdir(args.output):
                err = output_clear_guard(args.output, src)
                if err is not None:
                    print(f"error: {err}", file=sys.stderr)
                    return 2
                for r, _, fs in os.walk(args.output):
                    for f in fs:
                        if f.endswith(".parquet"):
                            os.unlink(os.path.join(r, f))
            ds.write_parquet(args.output)
            wall = time.perf_counter() - t0
            n_rows = ray.data.read_parquet(args.output).count()
            print(json.dumps({
                "input": src, "output": args.output, "stage": args.stage,
                "rows": n_rows, "wall_s": round(wall, 3),
                "rows_per_s": round(n_rows / wall, 2) if wall > 0 else None,
            }))
            return 0
        if args.checkpoint:
            from .state.checkpoint import read_corrected, run_checkpointed

            manifest = run_checkpointed(
                src, args.output, num_partitions=args.num_partitions,
                concurrency=args.concurrency,
            )
            wall = time.perf_counter() - t0
            n_docs = read_corrected(args.output).count()
            summary = {
                "input": src, "output": args.output, "mode": "checkpointed",
                "docs": n_docs, "partitions": manifest.num_rows,
                "wall_s": round(wall, 3),
                "docs_per_s": round(n_docs / wall, 2) if wall > 0 else None,
            }
            print(json.dumps(summary))
            return 0
        ds = corrected_dataset(
            src, mode=args.mode, concurrency=args.concurrency,
            batch_size=args.batch_size, span_threshold=args.span_threshold,
        )
        # overwrite semantics: Ray's write_parquet generates fresh unique
        # filenames per run, so rerunning into a non-empty directory would
        # silently ACCUMULATE rows (2 runs = 2x docs on the readback) —
        # clear prior parquet output first.  The checkpoint path above has
        # its own manifest-driven resume and must NOT be cleared.
        if os.path.isdir(args.output):
            err = output_clear_guard(args.output, src)
            if err is not None:
                print(f"error: {err}", file=sys.stderr)
                return 2
            stale = [os.path.join(r, f) for r, _, fs in os.walk(args.output)
                     for f in fs if f.endswith(".parquet")]
            for f in stale:
                os.unlink(f)
            if stale:
                print(f"cleared {len(stale)} stale parquet file(s) in "
                      f"{args.output}", file=sys.stderr)
        ds.write_parquet(args.output)
        wall = time.perf_counter() - t0

        out_ds = ray.data.read_parquet(args.output)
        n_docs = out_ds.count()
        summary = {
            "input": src,
            "output": args.output,
            "mode": args.mode,
            "docs": n_docs,
            "wall_s": round(wall, 3),
            "docs_per_s": round(n_docs / wall, 2) if wall > 0 else None,
        }
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
