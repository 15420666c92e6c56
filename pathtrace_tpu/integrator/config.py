"""Integrator configuration.

Replaces the reference's compile-time #defines (CudaUtil.cuh:15-19):
MAX_BOUNCE 8, RUSSIAN_ROULETTE_BOUNCE 3, PROB_STOP_BOUNCE 0.5,
NUM_MULTI_SAMPLE 8, NUM_SAMPLE 1024 — here a static dataclass that is
hashable (jit-static) so each config compiles once.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    max_bounce: int = 8          # MAX_BOUNCE (CudaUtil.cuh:15)
    rr_bounce: int = 3           # RUSSIAN_ROULETTE_BOUNCE (CudaUtil.cuh:16)
    rr_stop_prob: float = 0.5    # PROB_STOP_BOUNCE (CudaUtil.cuh:17)
    refract_cap: int = 8         # RefractCnt > 8 breaks (CudaUtil.cuh:354)
    miss_radiance: tuple = (0.1, 0.1, 0.1)  # miss -> +0.1 gray (CudaUtil.cuh:377)
    pdf_clamp: float = 1e-2      # weight = eval/max(pdf, 1e-2) (CudaUtil.cuh:291 etc.)
    nee: bool = True             # next-event estimation on/off (A/B in README.md:56-58)
    # Diffuse-lobe hemisphere sampling: "cosine" (production) or
    # "uniform" - the reference's committed sampling A/B (Bxdf.cuh:23-41
    # SampleHemisphere; Img/Render/64sppWithCosineSampling.png vs
    # 64sppWithUniformSampling.png). Uniform keeps the estimator unbiased
    # via a 1/(2*pi) pdf; it only raises variance.
    hemisphere: str = "cosine"
    # Detach sampling decisions/pdfs for unbiased material gradients
    # (has no effect on the primal render).
    detach_sampling: bool = True
    # Rematerialize each bounce in the backward pass instead of storing
    # its activations (jax.checkpoint on the scan body): memory per
    # gradient step drops from O(bounces * wavefront state) to O(state),
    # recomputing the bounce forward during backprop. With counter-based
    # RNG the recomputation replays the identical sample stream - the
    # first step toward the full compact-path-record replay backward.
    remat: bool = False

    @property
    def max_iters(self) -> int:
        """Static bound on bounce-loop iterations: every iteration either
        consumes depth (< max_bounce of those) or a refraction credit
        (refract_cap + 2 events: pre-increment check `RefractCnt++ > 8`
        admits counts 0..refract_cap, breaks inside the following one)."""
        return self.max_bounce + self.refract_cap + 2
