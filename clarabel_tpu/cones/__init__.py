from .api import (
    SupportedCone,
    ZeroConeT,
    NonnegativeConeT,
    SecondOrderConeT,
    ExponentialConeT,
    PowerConeT,
    GenPowerConeT,
    PSDTriangleConeT,
    nvars,
    cones_collapse,
)
from .layout import ConeLayout
