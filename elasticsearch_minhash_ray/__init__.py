"""Ray-Data-native near-duplicate detection & clustering engine.

From-scratch reimplementation of the data-processing capabilities of
codelibs/elasticsearch-minhash (b-bit MinHash signatures, bit-for-bit) plus
the dedup pipeline stages the reference delegates to Elasticsearch query
primitives: LSH banding, candidate verification, and connected-component
clustering — all expressed as streaming ray.data Dataset transforms.

Layering:
    functions/  pure kernels (murmur3, minhash, tokenize, simhash, text stats)
    stages/     map_batches / map_groups callables (signature, lsh, cluster, ...)
    sources/    corpus readers, adapters, deterministic synthesis
    pipelines/  end-to-end compositions (near-dup flagship, dedup variants)
    state/      checkpoint / lineage for resumable runs
"""

from ._malloc import tune_malloc

tune_malloc()

from .functions.minhash import MinHashConfig, MinHasher, compare, to_base64, to_bit_string
from .pipelines.delta import DeltaResult, build_band_index, near_dup_delta
from .pipelines.neardup import (
    LSHConfig,
    NearDupResult,
    PipelineConfig,
    near_dup_keep,
    near_dup_pipeline,
    run_checkpointed,
)

__all__ = [
    "MinHashConfig",
    "MinHasher",
    "compare",
    "to_base64",
    "to_bit_string",
    "LSHConfig",
    "PipelineConfig",
    "NearDupResult",
    "near_dup_keep",
    "near_dup_pipeline",
    "run_checkpointed",
    "DeltaResult",
    "build_band_index",
    "near_dup_delta",
]

__version__ = "0.1.0"
