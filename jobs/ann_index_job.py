"""spark-submit entrypoint: persisted IVF ANN index — build / query.

The build-once-query-many deployment surface for the IVF
(k-means inverted file) ANN family (operators.similarity): ``build``
fits the quantizer and persists the cell-clustered assignment parquet +
centroid matrix; ``query`` probes a stored index without refitting —
the k-means cost is paid once at index time, and each probe's scan
prunes to the probed cells' files. Same packaging as the other jobs::

    zip -r engine.zip etl_reconciliate_spark
    spark-submit --master local[8] --py-files engine.zip \
        jobs/ann_index_job.py build --vectors /path/embeddings.parquet \
        --index /path/ivf_idx --dim 64 --n-centroids 64
    spark-submit --master local[8] --py-files engine.zip \
        jobs/ann_index_job.py query --index /path/ivf_idx \
        --queries /path/queries.parquet --k 10 --nprobe 6 \
        [--out /path/topk]

Prints one JSON line with build stats or query stats (and writes the
top-k result parquet when ``--out`` is given; otherwise prints a small
sample inline).

reference: no equivalent exists in the reference app — this is the
§"beyond the reference" similarity-search surface.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="fit + persist an IVF index")
    b.add_argument("--vectors", required=True,
                   help="parquet with (id, embedding array) columns")
    b.add_argument("--index", required=True, help="index output directory")
    b.add_argument("--dim", type=int, required=True)
    b.add_argument("--n-centroids", type=int, default=16)
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--max-iter", type=int, default=10)
    b.add_argument("--seed", type=int, default=7)

    q = sub.add_parser("query", help="top-k probe against a stored index")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True,
                   help="parquet with (id, embedding array) columns")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=4)
    q.add_argument("--id-col", default="vec_id")
    q.add_argument("--vec-col", default="embedding")
    q.add_argument("--out", default=None,
                   help="write the top-k result parquet here")
    q.add_argument("--sample", type=int, default=5,
                   help="rows of inline sample when --out is not given")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"ann_index_{args.cmd}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "build":
        from etl_reconciliate_spark.operators.similarity import build_ivf_index

        stats = build_ivf_index(
            spark.read.parquet(args.vectors),
            args.index,
            dim=args.dim,
            n_centroids=args.n_centroids,
            id_col=args.id_col,
            vec_col=args.vec_col,
            seed=args.seed,
            max_iter=args.max_iter,
        )
        print(json.dumps({"cmd": "build", **stats}))
        return 0

    from etl_reconciliate_spark.operators.similarity import ivf_topk_from_index

    topk = ivf_topk_from_index(
        spark,
        args.index,
        spark.read.parquet(args.queries),
        k=args.k,
        nprobe=args.nprobe,
        query_id_col=args.id_col,
        vec_col=args.vec_col,
    )
    out: dict = {"cmd": "query", "k": args.k, "nprobe": args.nprobe}
    if args.out:
        topk.write.mode("overwrite").option("compression", "zstd").parquet(
            args.out
        )
        res = spark.read.parquet(args.out)
        out["rows"] = res.count()
        out["queries"] = res.select("query_id").distinct().count()
        out["path"] = args.out
    else:
        rows = topk.limit(args.sample * args.k).collect()
        out["rows_sampled"] = len(rows)
        out["sample"] = [
            {"query_id": r["query_id"], "vec_id": r["vec_id"],
             "cosine": round(r["cosine"], 6), "rank": r["rank"]}
            for r in rows[: args.sample]
        ]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
