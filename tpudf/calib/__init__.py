from tpudf.calib.coral import (
    CoralCutpoints,
    coral_probs,
    coral_gauss_prob,
    fit_coral_cutpoints,
    RISK_NAMES,
)

__all__ = [
    "CoralCutpoints",
    "coral_probs",
    "coral_gauss_prob",
    "fit_coral_cutpoints",
    "RISK_NAMES",
]
