#!/usr/bin/env python
"""Build every materialized serving index for a corpus — the write-side
job a production deployment schedules after each corpus rebuild.

Artifacts (all parquet, all derived deterministically from the corpus):
  {out}/bm25      — term-bucket-partitioned integer postings + stats
                    (textstats.bm25_write; serves bm25_terms_served /
                    bm25_search)
  {out}/minhash   — signature matrix + band-partitioned LSH buckets
                    (dedup.minhash_write; serves minhash_lsh_pairs_served
                    and verified_neardup_pairs(cand=...))
  {out}/simhash   — fingerprint table (simhash.simhash_write; serves
                    simhash_pairs_served)
  {out}/lsh       — bucket-partitioned ANN embedding index
                    (similarity.lsh_write; serves lsh_topk_pruned)
  {out}/bloom     — decontamination words table + fingerprinted meta
                    (bloom.bloom_write; serves decontaminate_served,
                    which refuses a stale-benchmark index)
  {out}/ivf       — list_id-partitioned IVF index + centroids.json
                    (similarity.train_centroids + ivf_write; serves
                    ivf_topk_pruned)
  {out}/manifest.json — what was built, from which corpus, row counts

Usage: python tools/build_indexes.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adspark_indexes"

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import dedup, similarity, textstats
    from aws_data_pipeline_ads_spark.operators.simhash import simhash_write
    from aws_data_pipeline_ads_spark.session import get_session

    spark = get_session("build-indexes")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    manifest: dict[str, dict] = {}

    def step(name: str, fn) -> None:
        t0 = time.time()
        extra = fn() or {}
        manifest[name] = {"seconds": round(time.time() - t0, 2), **extra}
        print(f"  built {name} in {manifest[name]['seconds']}s")

    step("bm25", lambda: textstats.bm25_write(docs, f"{out}/bm25"))
    step("minhash", lambda: dedup.minhash_write(docs, f"{out}/minhash"))
    step("simhash", lambda: simhash_write(spark, docs, f"{out}/simhash"))
    step("lsh", lambda: similarity.lsh_write(emb, f"{out}/lsh"))

    def build_bloom() -> dict:
        from pyspark.sql import functions as F

        from aws_data_pipeline_ads_spark.operators.bloom import bloom_write
        from aws_data_pipeline_ads_spark.operators.dedup import doc_shingle_sets

        bench_sh = (
            doc_shingle_sets(docs.filter(F.col("doc_id") % 101 == 7), k=5)
            .select("tok").distinct()
        )
        bloom_write(bench_sh, "tok", f"{out}/bloom")
        return {"note": "meta carries the benchmark fingerprint; "
                        "decontaminate_served refuses a stale index"}

    step("bloom", build_bloom)

    def build_ivf() -> dict:
        cents = similarity.train_centroids(emb, 16)
        similarity.ivf_write(emb, cents, f"{out}/ivf")
        with open(f"{out}/ivf_centroids.json", "w") as f:
            json.dump(cents, f)
        return {"n_centroids": len(cents)}

    step("ivf", build_ivf)

    manifest["corpus"] = {
        "sf_dir": sf_dir,
        "n_documents": docs.count(),
        "n_embeddings": emb.count(),
    }
    with open(f"{out}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps({"out": out, "built": sorted(set(manifest) - {"corpus"})}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
