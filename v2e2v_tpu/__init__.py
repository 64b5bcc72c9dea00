"""v2e2v_tpu — a TPU-native (JAX/XLA/Pallas) event-camera framework.

Capabilities (re-designed TPU-first, not ported) of lsying009/V2E2V:

- E2V: events-to-video reconstruction with CISTA-LSTC / CISTA-TC networks
  (unrolled convolutional ISTA with learned soft-thresholding and
  ConvLSTC/ConvLSTM temporal states), expressed as pure functions over
  explicit parameter/state pytrees with ``jax.lax.scan`` temporal recurrence.
- V2E: a differentiable DVS event-camera emulator with sensing diversity
  (interleaved per-pixel contrast thresholds and photoreceptor cutoff
  frequencies, leak/shot noise, refractory period), vectorized with static
  iteration bounds and masking — no data-dependent shapes under ``jit``.
- V2E2V: the composed video -> events -> video pipeline, plus Super-SloMo
  adaptive frame upsampling.

Reference behavior documented against lsying009/V2E2V (file:line citations in
docstrings refer to that repository).
"""

__version__ = "0.1.0"

from .models.cista import (  # noqa: E402,F401
    CistaConfig,
    cista_lstc_step,
    cista_sequence,
    cista_tc_step,
    cista_zero_state,
    init_cista_lstc,
    init_cista_tc,
)
from .models.emulator import (  # noqa: E402,F401
    EmulatorConfig,
    EmulatorState,
    emulate_pack,
    emulate_pack_raw,
)
from .models.v2e2v import V2E2VConfig, V2E2VState, v2e2v_forward  # noqa: E402,F401
from .serving import StreamPool  # noqa: E402,F401
