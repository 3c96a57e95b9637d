"""CLI facade — the analog of the reference's ``ocr`` binary
(/root/reference/src/main.rs:63-117: ``--path`` + ``--mode json|text``),
re-expressed for parquet page corpora.

    python -m rust_paddle_ocr_ray --input /data/pages --output /data/out \
        --mode parquet|json|text [--checkpoint N] [--num-cpus C]

Modes (mirroring src/main.rs:134-208):
  parquet  extracted table -> partitioned parquet (the production sink)
  json     per-span records {url, text, confidence, position{start,end,
           line_start,line_end}} -> JSON files (the TextBox sink,
           src/main.rs:48-61); confidence here is the real decode
           confidence, unlike the CLI's hardcoded 1.0 (src/main.rs:178)
  text     extracted text per url -> stdout (debug path, small inputs
           only — takes a driver-side limit)
  overlay  one schematic span-overlay PNG per url -> parquet
           (url, width, height, n_spans, overlay_png) — the debug
           overlay sink (stages/overlay.py, SURVEY §2 S5; the analog
           of examples/simple.rs:96-129's draw-boxes output)

This is the ONLY module that may own a Ray session (driver contract:
the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import sys


def _resolve_address(arg_address: str | None) -> str:
    """CLI flag > $RAY_ADDRESS > 'local'.  'local' starts an in-process
    session sized by --num-cpus; anything else ('auto', 'ray://…') is a
    cluster attach — the form a `ray job submit` entrypoint runs under,
    where the cluster owns its resources."""
    import os

    return arg_address or os.environ.get("RAY_ADDRESS") or "local"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rust_paddle_ocr_ray")
    ap.add_argument("--input", required=True, help="parquet pages file/dir")
    ap.add_argument("--output", help="output dir (required for parquet/json)")
    ap.add_argument("--mode", choices=["parquet", "json", "text", "overlay"],
                    default="parquet")
    ap.add_argument("--checkpoint", type=int, default=0,
                    help="N>0: resumable run with N partitions (parquet mode)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--address", default=None,
                    help="Ray address: 'local' (default) starts an in-process "
                         "session; 'auto' attaches to a running cluster — the "
                         "form `ray job submit` entrypoints use.  Defaults to "
                         "$RAY_ADDRESS when set.")
    ap.add_argument("--limit", type=int, default=20, help="rows to print in text mode")
    args = ap.parse_args(argv)

    import ray

    address = _resolve_address(args.address)
    if not ray.is_initialized():
        if address == "local":
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:
            # cluster attach (ray job submit / ray start --head): the
            # cluster owns its resources — num_cpus must not be passed.
            if args.num_cpus is not None:
                print(f"warning: --num-cpus {args.num_cpus} ignored when "
                      f"attaching to a cluster (address={address!r}); the "
                      "cluster owns its resources", file=sys.stderr)
            ray.init(address=address, logging_level="ERROR")
    try:
        return _run(args)
    finally:
        ray.shutdown()


def _run(args) -> int:
    from .config import CLI_CONFIG
    from .pipelines.extract import ExtractPipeline

    pipe = ExtractPipeline(CLI_CONFIG)

    if args.mode == "text":
        out = pipe.run_paths(args.input)
        for row in out.limit(args.limit).take(args.limit):
            print(f"== {row['url']} ==")
            print(row["extracted_text"])
        return 0

    if not args.output:
        print("--output is required for parquet/json modes", file=sys.stderr)
        return 2

    if args.mode == "overlay":
        from .stages.overlay import overlay_pages

        spans = pipe.detect(pipe.read_pages(args.input))
        overlay_pages(spans).write_parquet(args.output)
        return 0

    if args.mode == "json":
        spans = pipe.recognize(pipe.detect(pipe.read_pages(args.input)))

        def textbox(b):
            import pyarrow as pa
            import pyarrow.compute as pc

            # drop the block_id = -1 sentinel rows (zero-span pages): the
            # reference CLI emits no boxes for blank inputs (src/main.rs:141-145)
            b = b.filter(pc.greater_equal(b["block_id"], pa.scalar(0)))
            cols = {
                "url": b["url"],
                "block_id": b["block_id"],
                "text": b["text"],
                "confidence": b["confidence"],
                "start": b["tstart"],
                "end": b["tend"],
                "line_start": b["line_start"],
                "line_end": b["line_end"],
            }
            return pa.Table.from_pydict(cols)

        spans.map_batches(textbox, batch_format="pyarrow").write_json(args.output)
        return 0

    # parquet
    if args.checkpoint > 0:
        import glob
        import os

        from .state import CheckpointedRun

        files = (sorted(glob.glob(os.path.join(args.input, "*.parquet")))
                 if os.path.isdir(args.input) else [args.input])
        run = CheckpointedRun(pipe, out_dir=args.output, num_partitions=args.checkpoint)
        manifest = run.execute(files)
        print(manifest)
        return 0
    pipe.run_paths(args.input).write_parquet(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
