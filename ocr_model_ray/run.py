"""Job driver: the `ray job submit`-able entry point for the extraction
pipeline (north rule: resumable, lineage-manifested, metrics-emitting).

    ray job submit -- python -m ocr_model_ray.run \
        --input /data/pages --output /data/extracted \
        --profile default --partitions 256 [--resume] [--exports]

Owns the Ray session (guarded init — in-cluster `ray job submit` has an
address; standalone runs init local). Emits per-stage metrics (docs,
wall seconds, per-operator Ray Data stats) to <output>/metrics/.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="pages parquet directory (url, warc_ts, html, text, lang)")
    ap.add_argument("--output", required=True, help="output root directory")
    ap.add_argument("--profile", default="default",
                    choices=["default", "performance", "quality", "basic"])
    ap.add_argument("--partitions", type=int, default=64,
                    help="output partitions (crc32(url) %% P); align to cluster size")
    ap.add_argument("--max-pages", type=int, default=None,
                    help="override the profile's per-document page cap")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore existing manifests and reprocess everything")
    ap.add_argument("--prior", default=None,
                    help="prior snapshot's output dir: run incrementally, "
                         "re-extracting only changed/new pages and carrying "
                         "unchanged rows over (pipelines/incremental.py)")
    ap.add_argument("--exports", action="store_true",
                    help="also write csv/txt/json/xml renderings")
    ap.add_argument("--wet", action="store_true",
                    help="also write the extracted text as WET-style "
                         "WARC conversion records (<output>/wet/)")
    ap.add_argument("--side-tables", action="store_true",
                    help="also write flat rows/regions/tables parquet")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="standalone only: ray.init(num_cpus=...)")
    ap.add_argument("--curate", action="store_true",
                    help="run the curation chain (lang gate -> Gopher "
                         "quality -> exact dedup -> decontam -> "
                         "sequence pack) over a documents-shaped "
                         "parquet input instead of extraction; "
                         "resumable via the same manifest protocol "
                         "(pipelines/curate_run.py)")
    ap.add_argument("--eval-set", default=None,
                    help="--curate only: parquet of held-out eval "
                         "texts to decontaminate against (column "
                         "'text'); omit for no decontamination")
    ap.add_argument("--langs", default=None,
                    help="--curate only: comma-separated language "
                         "gate (default en,de,fr,es)")
    ap.add_argument("--seq-len", type=int, default=256,
                    help="--curate only: packing sequence length")
    ap.add_argument("--no-pack", action="store_true",
                    help="--curate only: skip the packing phase")
    ap.add_argument("--waves", type=int, default=1,
                    help="--curate only: commit granularity of the "
                         "curated write (run_curation docstring)")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    if args.curate:
        from ocr_model_ray.pipelines.curate_run import run_curation
        from ocr_model_ray.pipelines.curation import DEFAULT_LANGS
        if args.no_resume:
            import shutil
            shutil.rmtree(args.output, ignore_errors=True)
        grams: set = set()
        if args.eval_set:
            import ray.data as rd
            from ocr_model_ray.functions.decontam import ngram_set
            ev = rd.read_parquet(args.eval_set, columns=["text"])
            for b in ev.iter_batches(batch_format="pandas",
                                     batch_size=None):
                grams |= ngram_set(b["text"])
        langs = (tuple(args.langs.split(",")) if args.langs
                 else DEFAULT_LANGS)
        record = run_curation(args.input, args.output, grams,
                              langs=langs,
                              num_partitions=args.partitions,
                              seq_len=args.seq_len,
                              pack=not args.no_pack,
                              waves=args.waves)
        print(json.dumps(record))
        return 0

    from ocr_model_ray.pipelines.checkpoint import run_resumable
    from ocr_model_ray.pipelines.profiles import profile
    from ocr_model_ray.state import manifest as mf

    cfg = profile(args.profile)
    if args.max_pages is not None:
        from dataclasses import replace
        cfg = replace(cfg, max_pages=args.max_pages)

    if args.no_resume:
        import shutil
        shutil.rmtree(args.output, ignore_errors=True)

    t0 = time.monotonic()
    if args.prior:
        from ocr_model_ray.pipelines.incremental import run_incremental
        record = run_incremental(args.input, args.prior, args.output,
                                 cfg, num_partitions=args.partitions)
    else:
        record = run_resumable(args.input, args.output, cfg,
                               num_partitions=args.partitions,
                               drop_nested=(cfg.emit == "summary"))
    record["driver_wall_s"] = round(time.monotonic() - t0, 3)
    record["profile"] = args.profile

    if args.exports:
        from dataclasses import replace
        from ocr_model_ray.pipelines.extract_pipeline import extract_pipeline
        from ocr_model_ray.stages.export import write_all_formats
        t1 = time.monotonic()
        # exports render the layout (rows/regions/pages) -> full emit
        write_all_formats(extract_pipeline(args.input, replace(cfg, emit="full")),
                          f"{args.output}/exports")
        record["exports_wall_s"] = round(time.monotonic() - t1, 3)

    if args.wet:
        import ray.data as rd
        from ocr_model_ray.sources.warc import write_wet_dir
        t3 = time.monotonic()
        extracted = rd.read_parquet(f"{args.output}/data",
                                    columns=["url", "extracted_text"])
        receipts = write_wet_dir(extracted, f"{args.output}/wet")
        record["wet_records"] = int(receipts.sum("n_records") or 0)
        record["wet_wall_s"] = round(time.monotonic() - t3, 3)

    if args.side_tables:
        from dataclasses import replace
        from ocr_model_ray.pipelines.extract_pipeline import (
            extract_pipeline, regions_table, rows_table, tables_table)
        t2 = time.monotonic()
        full = extract_pipeline(args.input, replace(cfg, emit="full"))
        rows_table(full).write_parquet(f"{args.output}/rows")
        regions_table(extract_pipeline(args.input, replace(cfg, emit="full"))) \
            .write_parquet(f"{args.output}/regions")
        tables_table(extract_pipeline(args.input, replace(cfg, emit="full"))) \
            .write_parquet(f"{args.output}/tables")
        record["side_tables_wall_s"] = round(time.monotonic() - t2, 3)

    mf.write_metrics(args.output, record)
    from ocr_model_ray.state.metrics import write_metrics_parquet
    write_metrics_parquet(args.output)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
