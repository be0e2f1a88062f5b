from multimodal_outage_tpu.models.fusion import ModifiedUNet, build_model  # noqa: F401
from multimodal_outage_tpu.models.date2vec import Date2Vec  # noqa: F401
from multimodal_outage_tpu.models.gwnet import GraphWaveNet  # noqa: F401
from multimodal_outage_tpu.models.dcrnn import DCRNN  # noqa: F401
