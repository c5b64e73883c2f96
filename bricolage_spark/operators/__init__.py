"""Scale-path data-processing operators (SURVEY.md §2.7).

Everything here is partition-parallel by construction: no ``collect()`` on
data paths, aggregation is two-phase (map-side partial), joins on bounded
key spaces are broadcast, and hash functions are engine-independent
(md5-derived) so results are reproducible across engines and runs.
"""

from bricolage_spark.operators.asof import asof_join  # noqa: F401
from bricolage_spark.operators.dedup import (  # noqa: F401
    content_hash,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from bricolage_spark.operators.similarity import (  # noqa: F401
    brute_force_cosine_topk,
    cosine_sim,
    lsh_bucketed_topk,
)
from bricolage_spark.operators.textual import (  # noqa: F401
    detect_language,
    fingerprint,
    quality_score,
    token_stats,
)
