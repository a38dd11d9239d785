"""Large-scale pipeline operators: dedup, text analysis, similarity
search, multimodal plumbing."""

from .ann import (  # noqa: F401
    IvfIndex,
    cosine_scores,
    ivf_build,
    ivf_query,
    ivf_knn_join,
    ivf_recall,
    ivf_topk,
    knn_join,
    knn_join_distributed,
    topk_neighbors,
)
from .dedup import (  # noqa: F401
    embedding_neardup_pairs,
    exact_duplicates,
    minhash_neardup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
    simhash_signatures,
)
from .contamination import (  # noqa: F401
    corpus_overlap,
    decontaminate,
    decontaminate_neardup,
    eval_ngram_hashes,
)
from .pii import pii_redact, pii_scan  # noqa: F401
from .split import (  # noqa: F401
    hash_split,
    pack_sequences,
    split_bucket,
    stratified_sample,
    stratified_sample_sql_pred,
)
from .graph import connected_components, dedup_clusters  # noqa: F401
from .shards import (  # noqa: F401
    plan_shards,
    read_shard_files,
    read_shards,
    shard_audit,
    shard_tars,
    tar_member_blocks,
    write_shards,
)
from .asr import (  # noqa: F401
    TranscriptFidelityRule,
    normalize_transcript,
    transcript_cer,
    transcript_fidelity,
    transcript_wer,
    word_edit_distance,
)
from .bpe import (  # noqa: F401
    bpe_encode,
    bpe_encode_word,
    bpe_merges_from_counts,
    bpe_train,
)
from .funnel import curation_funnel  # noqa: F401
from .mixture import (  # noqa: F401
    bucket_int,
    mixture_plan,
    mixture_sample,
    weighted_sample,
    weighted_sample_sql_pred,
)
from .semantic import (  # noqa: F401
    kmeans_assign,
    semantic_dedup,
    semantic_dedup_recall,
)
from .text import (  # noqa: F401
    fingerprint,
    lang_id,
    repetition_stats,
    text_quality,
    token_stats,
    unigram_logprob,
)
from .multimodal import decode_stub, extract_clip_features  # noqa: F401
from .image import (  # noqa: F401
    ImageConsistencyRule,
    decode_images,
    dhash64,
    image_features,
)
from .video import (  # noqa: F401
    VideoConsistencyRule,
    count_y4m_frames,
    video_frame_features,
)
