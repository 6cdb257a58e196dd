"""Classic-CF educational models (the reference's ``model/*/Basic``
standalone scripts, SURVEY.md section 2.3), re-built as a coherent
subpackage: vectorized scipy/numpy/JAX implementations behind a shared
``fit / recommend`` interface and the Basic scripts' own metric family
(precision / recall / coverage / popularity — a different family from the
framework's HR/MRR/NDCG, reproduced in ``classic.evaluation``).
"""

from cleverrec_tpu.classic.base import (  # noqa: F401
    InteractionData, evaluate_topn, topn_from_scores)
from cleverrec_tpu.classic.neighborhood import (  # noqa: F401
    ContentKNN, ItemCF, UserCF)
from cleverrec_tpu.classic.nonpersonalized import (  # noqa: F401
    MostPopular, RandomModel)
from cleverrec_tpu.classic.mf import LFM  # noqa: F401
from cleverrec_tpu.classic.graph_walk import PersonalRank  # noqa: F401
from cleverrec_tpu.classic.tags import TagBasedModel  # noqa: F401
from cleverrec_tpu.classic.temporal import (  # noqa: F401
    RecentPopular, SessionGraph, TimeItemCF, TimeUserCF)
from cleverrec_tpu.classic.rating_knn import (  # noqa: F401
    BiasSVD, FunkSVD, RatingItemCF, RatingUserCF)
from cleverrec_tpu.classic.rating_mf import (  # noqa: F401
    SLIM, SlopeOne, SVDpp, TrustSVD)
