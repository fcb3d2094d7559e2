from .resize import resize_bilinear, resize_nearest
from .pooling import adaptive_avg_pool, max_pool_3x3_s2
from .pop import (
    l2_normalize,
    orthogonal_decompose,
    classifier_scalars,
    classifier_apply,
    pop_logits_base,
    pop_logits_all,
    proto_similarity,
)
