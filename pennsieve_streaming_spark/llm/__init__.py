"""Large-scale training-data-pipeline operators (BASELINE.json north
star): deduplication, similarity search, text analysis, multimodal
column plumbing — all DataFrame-first, designed for 100 TB inputs."""

from pennsieve_streaming_spark.llm.hashing import (  # noqa: F401
    P_POLY,
    P_MINHASH,
    poly_hash_expr,
    poly_hash_duck,
)
from pennsieve_streaming_spark.llm.dedup import (  # noqa: F401
    duplicated_span_stats,
    exact_dedup,
    shingles,
    minhash_signatures,
    minhash_wide,
    lsh_band_keys,
    lsh_candidate_pairs,
    jaccard_pairs,
    scrub_duplicated_spans,
    simhash,
    simhash_near_pairs,
)
from pennsieve_streaming_spark.llm.graph import (  # noqa: F401
    cluster_dedup,
    components_for,
    connected_components,
)
from pennsieve_streaming_spark.llm.sketch import (  # noqa: F401
    hll_distinct,
    hll_distinct_by,
    hll_estimate,
    hll_merge,
    hll_registers,
    kmv_distinct,
)
from pennsieve_streaming_spark.llm.text import (  # noqa: F401
    bm25_search,
    build_vocab,
    encode_token_ids,
    inverted_index,
    token_stats,
    quality_score,
    lang_id,
    fingerprint,
    tfidf_top_terms,
)
from pennsieve_streaming_spark.llm.similarity import (  # noqa: F401
    cosine_topk,
    cosine_near_dup_pairs,
    ivf_ann,
    ivf_pq_ann,
    kmeans_assign,
    kmeans_fit,
    cosine_topk_two_stage,
    load_centroids,
    lsh_bucketed_ann,
    save_centroids,
    pq_ann,
    pq_encode,
    semdedup,
)
from pennsieve_streaming_spark.llm.curation import (  # noqa: F401
    bigram_lm_score,
    block_dedup,
    contamination,
    curate_corpus,
    importance_weights,
    line_dedup,
    mixture_weights,
    mixture_weights_temperature,
    pack_sequences,
    pii_scrub,
    quality_classifier_fit,
    quality_classifier_score,
    quality_thresholds,
    repetition_stats,
    source_best,
    stratified_sample,
    unigram_lm_score,
    write_training_shards,
)
