"""Profile the verified_pairs staging pole stage by stage (guide §1).

Times, with the noop sink and the default session:
  postings build, sets build, sigs, cand (incl. sigs), jaccard-verify
  (incl. all) — each labeled; prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, sys.argv[1] if len(sys.argv) > 1 else "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bricolage_spark.operators import dedup as D  # noqa: E402
from bricolage_spark.queries import llm_ops as L  # noqa: E402
from bricolage_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile_pole")
L.release_caches()
# warm-up
spark.range(1000000).selectExpr("sum(id)").collect()

res = {}

def t(name, thunk):
    spark.sparkContext.setJobDescription(f"pole: {name}")
    t0 = time.perf_counter()
    thunk()
    res[name] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(name, res[name], flush=True)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

t("postings_build", lambda: L._doc_shingles(spark, sf_dir).count())
t("sets_build", lambda: L._doc_shingle_sets(spark, sf_dir).count())

sh = L._doc_shingles(spark, sf_dir).withColumnRenamed("doc_id", "id")
sets = L._doc_shingle_sets(spark, sf_dir).withColumnRenamed("doc_id", "id")
sigs = D.minhash_signatures(sh, "id", num_hashes=L._N_HASHES)
t("sigs_noop", lambda: noop(sigs))
cand = D.lsh_candidate_pairs(
    sigs, "id", bands=L._BANDS, rows_per_band=L._ROWS_PER_BAND,
    max_bucket=L._MAX_BUCKET,
)
t("cand_noop", lambda: noop(cand))
jac = D.ngram_jaccard_pairs(sh, cand, id_col="id", sets=sets).filter(
    F.col("jaccard") >= L._JACCARD_MIN
)
t("jac_noop", lambda: noop(jac))
t("jac_noop_2", lambda: noop(jac))
# row counts for context
res["n_docs"] = L.read_table(spark, sf_dir, "documents").count()
res["n_postings"] = L._doc_shingles(spark, sf_dir).count()
res["n_cand"] = cand.count()
res["n_pairs"] = jac.count()
print(json.dumps(res))
