from tpudf.models.siglip import (
    SigLIPConfig,
    CONFIGS,
    init_siglip,
    siglip_forward,
)

__all__ = ["SigLIPConfig", "CONFIGS", "init_siglip", "siglip_forward"]
