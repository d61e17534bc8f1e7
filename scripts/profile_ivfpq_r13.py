"""Phase-level profile of q_sim_ann_ivfpq (round-13 optimization).

Times each phase of the IVFADC pipeline separately — count/head, IVF
training, residual+PQ training, search build+noop — so the 12.8 s bench
reading can be attributed to data-path vs plan/driver overhead.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from sakura_spark import get_spark
from sakura_spark.functions import similarity


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sakura-profile-ivfpq")
    _t = entrymod._t
    # Warm-up
    _t(spark, sf_dir, "region").count()

    for rep in range(2):
        marks = {}
        t = time.time()

        def mark(name):
            nonlocal t
            marks[name] = round(time.time() - t, 3)
            t = time.time()

        emb = _t(spark, sf_dir, "embeddings")
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0)
                .select("embedding").head()[0]]
        mark("qvec_head")
        total = emb.count()
        mark("count")
        centroids = similarity.ivf_train(
            emb, n_centroids=8, iters=2, vec_col="embedding", id_col="vec_id"
        )
        mark("ivf_train")
        res = similarity.ivf_residuals(emb, centroids)
        books = similarity.pq_train(
            res, m=4, k=16, iters=2, vec_col="residual", id_col="vec_id",
            dim=len(centroids[0]),
        )
        mark("pq_train")
        out = similarity.ann_ivfpq_topk(
            emb, qvec, k=10, n_centroids=8, n_probe=3, m=4, n_codes=16,
            rerank_factor=10, centroids=centroids, codebooks=books,
        )
        mark("search_plan_build")
        out.write.format("noop").mode("overwrite").save()
        mark("search_exec")
        print(f"rep{rep} rows={total} phases={marks} "
              f"total={round(sum(marks.values()), 3)}", flush=True)


if __name__ == "__main__":
    main()
