from fashionern_aaai2024_tpu.models.ern.fusion import (
    BertEncoder,
    CombinerSimple,
    DVRModule,
    PlusModel,
    VisualSR,
)
from fashionern_aaai2024_tpu.models.ern.ern import ERN
