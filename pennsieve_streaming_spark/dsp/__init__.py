"""Signal-processing kernels: Butterworth IIR design + stateful
application (reference G1-G3), pure numpy (scipy unavailable here;
the design math is the standard public bilinear-transform derivation).
"""

from pennsieve_streaming_spark.dsp.butterworth import (  # noqa: F401
    butter_sos,
    sosfilt,
    sos_freq_response,
    filter_transient_length,
    reflected_prewarm,
)
from pennsieve_streaming_spark.dsp.filtering import (  # noqa: F401
    FilterSpec,
    apply_filter,
    apply_filter_bulk,
)
