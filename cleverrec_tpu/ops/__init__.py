from cleverrec_tpu.ops.topk import (  # noqa: F401
    grouped_topk, merge_topk, sharded_topk_scores, streaming_topk)
from cleverrec_tpu.ops.pallas_scores import (fused_dot_scores,  # noqa: F401
                                             fused_dot_topk_scores)
