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
