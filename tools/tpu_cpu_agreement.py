"""Committed TPU-vs-CPU agreement artifact.

Renders the golden configurations on the real TPU (wavefront + fused
engines) and compares them against the committed CPU goldens
(tests/golden/*, generated per tests/golden/README). Writes
docs/tpu_cpu_agreement.json; tests/test_golden.py asserts the committed
artifact passes. Per-path arithmetic differs across backends (fusion,
MXU vs dot), so agreement is statistical: pixel-fraction within
tolerance + mean agreement, the same contract the golden tests use.

    python tools/tpu_cpu_agreement.py   # one TPU process at a time
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu import render
from pathtrace_tpu.integrator.wavefront import render_wavefront
from pathtrace_tpu.ops.pallas.bounce_kernel import render_wavefront_fused
from pathtrace_tpu.models import procedural
from pathtrace_tpu.utils import rng

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

results = []


def compare(name, img, golden_name, min_agree=0.999,
            max_mean_rel=1e-3):
    """Thresholds default to the Cornell near-exact contract; the glass
    scene passes looser ones (0.97 / 5e-3, matching test_golden.py's own
    glass contract): refraction makes per-path transport chaotic, so
    f32-rounding-level cross-backend differences amplify into isolated
    pixel flips while the image statistics stay pinned."""
    ref = np.load(os.path.join(GOLDEN, golden_name))
    img = np.asarray(img)
    close = np.isclose(img, ref, rtol=5e-3, atol=5e-3)
    entry = {
        "run": name,
        "golden": golden_name,
        "pixel_agreement": float(close.mean()),
        "mean_rel_diff": float(abs(img.mean() - ref.mean()) / ref.mean()),
        "max_abs_diff": float(np.abs(img - ref).max()),
        "ok": bool(close.mean() > min_agree
                   and abs(img.mean() - ref.mean()) / ref.mean()
                   < max_mean_rel),
    }
    results.append(entry)
    print(entry, flush=True)


dev = str(jax.devices()[0])
assert "TPU" in dev, f"run this on the TPU, got {dev}"

cornell = procedural.cornell_box_scene().with_mt().to_device()
cam32 = procedural.default_camera(32, 32)
key = rng.make_key(123)
compare("tpu-megakernel", render(cornell, cam32, 8, key),
        "cornell_32x32_8spp_seed123.npy")
compare("tpu-wavefront", render_wavefront(cornell, cam32, 8, key,
                                          lanes=1024),
        "cornell_32x32_8spp_seed123.npy")
compare("tpu-fused", render_wavefront_fused(cornell, cam32, 8, key,
                                            lanes=1024, block_r=1024)[0],
        "cornell_32x32_8spp_seed123.npy")

glass = procedural.glass_scene().with_mt().to_device()
cam24 = procedural.default_camera(24, 24)
compare("tpu-megakernel-glass", render(glass, cam24, 8, rng.make_key(7)),
        "glass_24x24_8spp_seed7.npy", min_agree=0.97, max_mean_rel=5e-3)

# mesh row: the production KD pair-block path (wavefront + v3 dispatch +
# bf16-split Pallas kernel) vs a CPU golden rendered with the exact
# MT-matmul megakernel (KD-free backend). This is the most bf16-exposed
# surface in the repo - round 4's silently-4x-dark NEE bug was caught by
# exactly this artifact class. Near-exact contract: per-path streams are
# scheduler-independent and the KD winner matches brute exactly on CPU,
# so only cross-compilation float noise remains.
blob = procedural.blob_mesh_scene().with_kd_binned().to_device()
cam48 = procedural.default_camera(48, 48)
compare("tpu-wavefront-kd-mesh",
        render_wavefront(blob, cam48, 4, rng.make_key(11), lanes=2304),
        "blob82k_48x48_4spp_seed11.npy", min_agree=0.995)

out = {"device": dev, "results": results,
       "pass": all(r["ok"] for r in results)}
os.makedirs("docs", exist_ok=True)
with open("docs/tpu_cpu_agreement.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({"pass": out["pass"]}))
