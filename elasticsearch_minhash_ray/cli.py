"""CLI entry point — the ``ray job submit`` surface of the engine.

On a cluster::

    ray job submit --working-dir . -- \
        python -m elasticsearch_minhash_ray neardup \
        --input s3://corpus/parquet --output s3://out/run1 --resume

Locally (owns its Ray session; standalone scripts are the only place allowed
to call ray.init per the driver contract)::

    python -m elasticsearch_minhash_ray neardup --input /tmp/corpus \
        --output /tmp/out --num-shards 8

Subcommands:
    sign     signatures only: corpus parquet -> signatures parquet
    neardup  full pipeline with checkpoint/lineage/resume (run_checkpointed)
    keep     dedup ACTION: near-dup pipeline + keep one representative per
             cluster (+ all unclustered docs) -> curated-corpus keys parquet
    index    build the persistent band index (incremental-dedup base)
    delta    incremental near-dup of NEW docs vs a band index (shuffle ∝ delta)
    clean    substring- or line-level dedup cleaning: corpus parquet ->
             (doc_id, n_tokens|n_lines, n_removed, cleaned_text) parquet
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--input", required=True, help="corpus parquet file/dir (repo,path,commit,lang,content)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--num-of-hash", type=int, default=128, help="k, reference 'size' param")
    p.add_argument("--bit", type=int, default=1, help="b, bits sampled per hash")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--tokenizer",
        default="standard",
        choices=["standard", "standard_regex", "whitespace", "words", "code"],
    )
    p.add_argument("--shingle", type=int, default=1, help="w-shingle size before minhash")
    p.add_argument("--concurrency", type=int, default=None, help="max signature actors (default: cpus)")


def _configs(args):
    from . import LSHConfig, MinHashConfig, PipelineConfig

    mh = MinHashConfig(
        num_of_hash=args.num_of_hash,
        bit=args.bit,
        seed=args.seed,
        tokenizer=args.tokenizer,
        shingle=args.shingle,
        name="sig",
    )
    kw = {}
    if getattr(args, "threshold", None) is not None:
        kw["threshold"] = args.threshold
    if getattr(args, "n_bands", None) is not None:
        kw["n_bands"] = args.n_bands
    lsh = LSHConfig(num_partitions=getattr(args, "num_partitions", 64), **kw)
    conc = args.concurrency
    if conc is None:
        import os

        conc = len(os.sched_getaffinity(0))
    return PipelineConfig(
        minhash=mh,
        lsh=lsh,
        sig_concurrency=(max(1, conc // 2), conc),
        num_shards=getattr(args, "num_shards", 1),
        shard_by=getattr(args, "shard_by", "hash"),
        distributed_cc=getattr(args, "distributed_cc", False),
    )


def cmd_sign(args) -> int:
    from .pipelines.neardup import compute_signatures
    from .sources.corpus import read_corpus

    cfg = _configs(args)
    ds = read_corpus(args.input)
    sig_cols = (*cfg.keep_columns, "minhash_sig")
    # materialize once: write + count off the same blocks (a lazy count()
    # after write_parquet would re-execute the whole signature stage)
    out = compute_signatures(ds, cfg, keep_columns=sig_cols).materialize()
    out.write_parquet(args.output)
    print(json.dumps({"output": args.output, "rows": out.count()}))
    return 0


def cmd_clean(args) -> int:
    from .sources.corpus import prepare_batch, read_corpus
    from .stages.substring import substring_dedup_clean
    from .stages.text import line_dedup_global

    ds = read_corpus(args.input).map_batches(prepare_batch, batch_format="pyarrow")
    if args.mode == "substring":
        out = substring_dedup_clean(
            ds, k=args.k, text_col="content", id_col="doc_key",
            num_partitions=args.num_partitions,
        )
    else:
        out = line_dedup_global(
            ds, min_dup=args.min_dup, min_len=args.min_len,
            text_col="content", id_col="doc_key",
            num_partitions=args.num_partitions,
        )
    # materialize once: the cut stage (corpus re-read + re-tokenize) must not
    # re-execute just to print the row count
    out = out.materialize()
    out.write_parquet(args.output)
    print(json.dumps({"output": args.output, "rows": out.count(), "mode": args.mode}))
    return 0


def cmd_neardup(args) -> int:
    from . import run_checkpointed

    cfg = _configs(args)
    manifest = run_checkpointed(args.input, args.output, cfg)
    print(json.dumps(manifest, default=str))
    return 0


def cmd_keep(args) -> int:
    """The dedup ACTION: near-dup pipeline + keep one representative per
    cluster (min doc_key) and every unclustered doc — writes the curated
    corpus keys/lineage columns as parquet."""
    from . import near_dup_keep, near_dup_pipeline
    from .sources.corpus import read_corpus

    cfg = _configs(args)
    res = near_dup_pipeline(read_corpus(args.input), cfg)
    kept = near_dup_keep(
        res.signatures,
        res.clusters,
        columns=cfg.keep_columns,
        num_partitions=args.num_partitions,
        broadcast_limit=args.broadcast_limit,
    ).materialize()
    kept.write_parquet(args.output)
    print(json.dumps({"output": args.output, "rows": kept.count(), **res.metrics}))
    return 0


def cmd_index(args) -> int:
    """Build the persistent band index (the incremental-dedup base): corpus
    parquet -> part=K/ band shards + lineage at --output."""
    from .pipelines.delta import build_band_index
    from .pipelines.neardup import compute_signatures
    from .sources.corpus import read_corpus

    cfg = _configs(args)
    sigs = compute_signatures(
        read_corpus(args.input), cfg, keep_columns=("doc_key", f"minhash_{cfg.minhash.name}")
    )
    lin = build_band_index(sigs, cfg, args.output, run_id=args.run_id)
    print(json.dumps(lin, default=str))
    return 0


def cmd_delta(args) -> int:
    """Incremental near-dup: NEW corpus vs an existing band index. Shuffle
    cost ∝ delta size; the old corpus is read per-partition from the index,
    never re-banded or re-shuffled. Writes new edges (and clusters when
    --old-edges is given) under --output, and appends the new band rows to
    the index unless --no-update-index."""
    from .pipelines.delta import near_dup_delta
    from .sources.corpus import read_corpus

    cfg = _configs(args)
    res = near_dup_delta(
        read_corpus(args.input),
        args.index,
        cfg,
        old_edges=args.old_edges,
        update_index=not args.no_update_index,
        run_id=args.run_id,
    )
    res.new_edges.write_parquet(f"{args.output}/new_edges")
    out = {"output": args.output, **res.metrics}
    if res.clusters is not None:
        import ray.data as rd

        clusters = res.clusters
        if not isinstance(clusters, rd.Dataset):
            import pyarrow.parquet as pq

            pq.write_table(clusters, f"{args.output}/clusters.parquet")
            out["n_clustered_docs"] = clusters.num_rows
        else:
            clusters.write_parquet(f"{args.output}/clusters")
            out["n_clustered_docs"] = clusters.count()
    print(json.dumps(out, default=str))
    return 0


def _entry_module():
    """Import the repo-root ``__ray_entry__`` catalog. The CLI ships inside
    the package but the query catalog (driver contract) lives at the repo
    root; resolve it relative to this file so the subcommand works from any
    cwd."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", root / "__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _entry_queries() -> list[str]:
    return sorted(_entry_module().queries())


def cmd_query(args) -> int:
    qs = _entry_module().queries()
    if not args.name or args.name not in qs:
        print(json.dumps({"error": f"unknown query {args.name!r}; use --list"}))
        return 2
    res = qs[args.name](args.sf_dir)
    out: dict = {"query": args.name, "sf_dir": args.sf_dir}
    import ray.data

    if isinstance(res, ray.data.Dataset):
        if args.output:
            res.write_parquet(args.output)
            out["output"] = args.output
        out["n_rows"] = res.count()
    else:  # pandas / pyarrow results are driver-small
        import pandas as pd

        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if args.output:
            df.to_parquet(f"{args.output.rstrip('/')}/result.parquet")
            out["output"] = args.output
        out["n_rows"] = len(df)
    print(json.dumps(out, default=str))
    return 0


def cmd_compact(args) -> int:
    """Small-file compaction: read a fragmented parquet directory, coalesce
    to ~target-rows blocks, rewrite. The 100-TB housekeeping pass after
    incremental ingest — thousands of tiny delta shards re-pack into
    read-efficient files; repartition here is a COALESCE (no shuffle),
    rows keep their block-local order."""
    from .sources.corpus import read_parquet_auto

    ds = read_parquet_auto(args.input)
    n = ds.count()
    blocks = max(1, -(-n // args.target_rows))
    if getattr(args, "sort_by", None):
        # clustered layout: one range-partitioning sort so equal/nearby keys
        # co-locate in files — downstream keyed reads touch fewer row groups
        ds = ds.sort(args.sort_by)
    part_cols = getattr(args, "partition_by", None)
    if part_cols:
        # hive layout (key=value/ dirs): downstream reads of one partition
        # touch only its directory, and a failed rewrite resumes per
        # partition — the resumable-output shape for keyed corpora
        ds.repartition(blocks).write_parquet(
            args.output, partition_cols=part_cols.split(",")
        )
    else:
        ds.repartition(blocks).write_parquet(args.output)
    print(json.dumps({"rows": n, "output_blocks": blocks, "output": args.output,
                      "sort_by": getattr(args, "sort_by", None),
                      "partition_by": part_cols}))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="elasticsearch_minhash_ray", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_sign = sub.add_parser("sign", help="compute signatures only")
    _add_common(p_sign)

    p_nd = sub.add_parser("neardup", help="full near-dup pipeline (resumable)")
    _add_common(p_nd)
    p_nd.add_argument("--threshold", type=float, default=None, help="verify threshold (fraction of equal bits)")
    p_nd.add_argument("--n-bands", type=int, default=None)
    p_nd.add_argument("--num-partitions", type=int, default=64)
    p_nd.add_argument("--num-shards", type=int, default=1, help="signature checkpoint shards (resume unit)")
    p_nd.add_argument("--shard-by", default="hash", choices=["hash", "file"],
                      help="'file' = one shard per input parquet file (incremental ingest: appended files reuse existing checkpoints)")
    p_nd.add_argument("--distributed-cc", action="store_true", help="distributed connected components")

    p_keep = sub.add_parser(
        "keep", help="dedup ACTION: near-dup pipeline + keep one representative per cluster"
    )
    _add_common(p_keep)
    p_keep.add_argument("--threshold", type=float, default=None, help="verify threshold (fraction of equal bits)")
    p_keep.add_argument("--n-bands", type=int, default=None)
    p_keep.add_argument("--num-partitions", type=int, default=64)
    p_keep.add_argument("--distributed-cc", action="store_true", help="distributed connected components")
    p_keep.add_argument(
        "--broadcast-limit", type=int, default=2_000_000,
        help="drop-sets above this take the doc_key-partitioned union anti-join",
    )

    p_ix = sub.add_parser("index", help="build the persistent band index (incremental-dedup base)")
    _add_common(p_ix)
    p_ix.add_argument("--n-bands", type=int, default=None)
    p_ix.add_argument("--num-partitions", type=int, default=64,
                      help="FROZEN into the index layout — size for the FULL corpus (≈ band bytes / 32MB)")
    p_ix.add_argument("--run-id", default="base")

    p_dl = sub.add_parser("delta", help="incremental near-dup of NEW docs vs a band index")
    _add_common(p_dl)
    p_dl.add_argument("--index", required=True, help="band index dir (from the 'index' subcommand)")
    p_dl.add_argument("--threshold", type=float, default=None, help="verify threshold (fraction of equal bits)")
    p_dl.add_argument("--n-bands", type=int, default=None)
    p_dl.add_argument("--num-partitions", type=int, default=64, help="must equal the index's (lineage-checked)")
    p_dl.add_argument("--old-edges", default=None, help="previous run's edges parquet (enables cluster output)")
    p_dl.add_argument("--no-update-index", action="store_true", help="dry run: don't append the new band rows")
    p_dl.add_argument("--run-id", required=True, help="unique id for this delta batch (replays are refused)")
    p_dl.add_argument("--distributed-cc", action="store_true", help="distributed connected components")

    p_cl = sub.add_parser("clean", help="substring/line dedup cleaning -> cleaned-text parquet")
    p_cl.add_argument("--input", required=True, help="corpus parquet file/dir")
    p_cl.add_argument("--output", required=True, help="output directory")
    p_cl.add_argument("--mode", default="substring", choices=["substring", "lines"])
    p_cl.add_argument("--k", type=int, default=50, help="substring mode: min duplicated window (tokens)")
    p_cl.add_argument("--min-dup", type=int, default=2, help="lines mode: global occurrence threshold")
    p_cl.add_argument("--min-len", type=int, default=1, help="lines mode: min line length to participate")
    p_cl.add_argument("--num-partitions", type=int, default=64)

    p_q = sub.add_parser(
        "query",
        help="run any catalog query from __ray_entry__.queries() over an "
        "sf-dir of parquet tables (use --list to enumerate)",
    )
    p_q.add_argument("name", nargs="?", help="query name (see --list)")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                     help="directory holding the parquet tables")
    p_q.add_argument("--output", default=None,
                     help="write result parquet here (default: print row count)")
    p_q.add_argument("--list", action="store_true", help="list query names and exit")

    p_cp = sub.add_parser(
        "compact",
        help="coalesce a fragmented parquet dir into ~target-rows blocks",
    )
    p_cp.add_argument("--input", required=True)
    p_cp.add_argument("--output", required=True)
    p_cp.add_argument("--target-rows", type=int, default=1_000_000)
    p_cp.add_argument("--sort-by", default=None,
                      help="cluster output by this column (one sort exchange)")
    p_cp.add_argument("--partition-by", default=None,
                      help="hive-partition output by these comma-separated columns")

    args = parser.parse_args(argv)

    if args.cmd == "query" and args.list:
        # no Ray session needed to enumerate
        print("\n".join(_entry_queries()))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        return {
            "sign": cmd_sign,
            "neardup": cmd_neardup,
            "clean": cmd_clean,
            "keep": cmd_keep,
            "index": cmd_index,
            "delta": cmd_delta,
            "query": cmd_query,
            "compact": cmd_compact,
        }[args.cmd](args)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
