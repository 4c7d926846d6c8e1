from . import corpus, dedup, multimodal, similarity, temporal, unigram  # noqa: F401
from .corpus import shuffle_shards, unigram_logprob  # noqa: F401
from .dedup import (  # noqa: F401
    bloom_bitmap,
    bloom_incremental_dedup,
    candidate_pairs,
    embedding_neardup_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_bands,
    minhash_dedup_keep,
    minhash_lsh_ml_pairs,
    semdedup_keep,
    simhash,
)
from .multimodal import (  # noqa: F401
    attach_payload_meta,
    decode_images,
    extract_features,
    payload_meta,
    sample_frames,
)
from .similarity import cosine_topk, lsh_topk  # noqa: F401
from .temporal import asof_join, range_join  # noqa: F401
