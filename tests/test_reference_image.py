"""Distributional parity against the reference's own published artifact
(round-3 VERDICT missing item 2) — the one end-to-end check that does
NOT go through raytpu's own oracles.

/root/reference/examples/12depth20rays.png is a v1-app ("DXRayTrace",
4:3 client area) screenshot of the seven-sphere v1 scene at the
filename's depth 12 / 20 spp; its sky rows decode exactly as
sqrt(linear sky), confirming v1's sqrt gamma.  See
scripts/compare_reference_image.py for the forensics.  The reference's
GPU fract-sin RNG stream is unknowable, so the comparison is
statistical: per-region mean colors and global channel histograms.

Calibration (full 640x480 @ 20 spp run of the script): region-mean
max abs diff 0.022, mean 0.004; histogram EMD <= 0.004/channel.  The
test renders reduced-res (stats are resolution-independent) and budgets
2-3x those values for spp noise.
"""

import os

import numpy as np
import pytest

import raytpu
from raytpu.config import REFERENCE_V1

REF = "/root/reference/examples/12depth20rays.png"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference artifact not present")


@pytest.fixture(scope="module")
def images():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.compare_reference_image import load_reference
    ref = load_reference()
    cfg = REFERENCE_V1.replace(width=160, height=120, spp=8, depth=10)
    img = np.asarray(raytpu.render(raytpu.v1_world(),
                                   raytpu.reference_camera_v1(), cfg,
                                   backend="golden"))[::-1]
    return img, ref


def test_provenance_v1_sqrt_gamma_sky(images):
    """The screenshot's top sky row must decode as sqrt(linear sky
    gradient) at a single blend factor t — pinning which app and gamma
    produced it."""
    _, ref = images
    top = ref[0].mean(axis=0)  # ~uniform across the row
    lin = top ** 2
    # lin = (1-t)*1 + t*(0.5, 0.7, 1.0)  =>  t from each channel
    t_r = (1 - lin[0]) / 0.5
    t_g = (1 - lin[1]) / 0.3
    assert abs(t_r - t_g) < 0.02, (t_r, t_g)
    assert lin[2] > 0.995  # blue channel is 1.0 at any t


def test_region_means_match(images):
    from scripts.compare_reference_image import region_means
    ours, ref = images
    d = np.abs(region_means(ours) - region_means(ref))
    assert d.max() < 0.06, d.max()
    assert d.mean() < 0.015, d.mean()


def test_global_stats_match(images):
    from scripts.compare_reference_image import channel_hist, emd_1d
    ours, ref = images
    gm = np.abs(ours.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
    assert gm.max() < 0.02, gm
    h_o, h_r = channel_hist(ours), channel_hist(ref)
    for c in range(3):
        assert emd_1d(h_o[c], h_r[c]) < 0.012, c
