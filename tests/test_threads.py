"""forge/threads tests (mirrors reference forge/threads/threads_test.go:14-44
plus render smoke checks)."""
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.eval import new_cpu_sdf3, new_sdf2
from gsdf_tpu.forge import threads
from gsdf_tpu.render import FlatRenderer

bld = Builder()


def test_iso_profile_signs():
    """Points inside/outside the ISO M3x0.5 external profile."""
    iso = threads.ISO(d=3.0, p=0.5, ext=True)
    profile = iso.thread(bld)
    sdf = new_sdf2(profile)
    radius = 1.5
    h = 0.5 / (2 * np.tan(np.radians(30)))
    r0 = radius - 7 / 8 * h
    pts = np.array(
        [
            [0.0, r0 - 0.05],  # below root: inside profile body
            [0.0, radius - 0.01],  # at crest center: inside
            [0.0, radius + 0.05],  # above crest: outside
            [0.25, radius],  # beside the tooth at crest height: outside
        ],
        np.float32,
    )
    d = sdf.evaluate(pts)
    assert d[0] < 0, f"root region should be inside, got {d[0]}"
    assert d[1] < 0, f"crest center should be inside, got {d[1]}"
    assert d[2] > 0, f"above crest should be outside, got {d[2]}"
    assert d[3] > 0, f"tooth flank gap should be outside, got {d[3]}"


def test_screw_basic():
    scr = threads.screw(bld, 2.0, threads.ISO(d=3.0, p=0.5, ext=True))
    sdf = new_cpu_sdf3(scr)
    d = sdf.evaluate(
        np.array(
            [[0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [0, 0, 1.2]], np.float32
        )
    )
    assert d[0] <= 0  # the axis maps to the profile's bottom edge (d = 0)
    assert d[1] < 0  # inside minor radius
    assert d[2] > 0  # outside major radius
    assert d[3] > 0  # beyond screw length
    bb = scr.bounds()
    assert bb.max[2] == pytest.approx(1.0)
    assert bb.max[0] >= 1.5


def test_screw_thread_period():
    """The thread surface repeats with the pitch along z."""
    scr = threads.screw(bld, 4.0, threads.ISO(d=3.0, p=0.5, ext=True))
    sdf = new_cpu_sdf3(scr)
    base = np.array([[1.4, 0.3, 0.1]], np.float32)
    shifted = base + np.array([[0, 0, 0.5]], np.float32)  # one pitch
    d0 = sdf.evaluate(base)
    d1 = sdf.evaluate(shifted)
    np.testing.assert_allclose(d0, d1, atol=1e-5)


def test_npt_lookup():
    npt = threads.NPT()
    npt.set_from_nominal(0.5)
    assert npt.d == pytest.approx(0.840)
    assert npt.tpi == 14
    p = npt.thread_params()
    assert p.taper == pytest.approx(np.arctan(1 / 32))
    with pytest.raises(ValueError):
        threads.NPT().set_from_nominal(17.0)


def test_metric_f2f():
    # M3 screw: radius 1.5 -> estimated f2f 4.5*1.5=6.75 -> table row 6
    assert threads.metric_f2f(1.5) == 6


def test_bolt_renders():
    b = threads.bolt(
        bld,
        threads.BoltParams(
            thread=threads.ISO(d=3, p=0.5, ext=True),
            style=threads.NutStyle.HEX,
            total_length=6.0,
            shank_length=2.0,
        ),
    )
    res = b.bounds().diagonal() / 64
    tris = FlatRenderer(b, res).render()
    assert len(tris) > 1000
    assert np.all(np.isfinite(tris))


def test_nut_renders():
    npt = threads.NPT()
    npt.set_from_nominal(0.5)
    n = threads.nut(bld, threads.NutParams(thread=npt, style=threads.NutStyle.CIRCULAR))
    res = n.bounds().diagonal() / 48
    tris = FlatRenderer(n, res).render()
    assert len(tris) > 500


def test_knurled_head_renders():
    kh = threads.knurled_head(bld, 1.0, 0.8, 0.25)
    res = kh.bounds().diagonal() / 48
    tris = FlatRenderer(kh, res).render()
    assert len(tris) > 500


def test_hex_head_renders():
    hh = threads.hex_head(bld, 1.0, 0.8, False, True)
    res = hh.bounds().diagonal() / 48
    tris = FlatRenderer(hh, res).render()
    assert len(tris) > 100


def test_acme_and_buttress_profiles():
    for thr in (
        threads.Acme(d=3.0, p=0.5),
        threads.ANSIButtress(d=3.0, p=0.5),
        threads.PlasticButtress(d=3.0, p=0.5),
        threads.UTS(d=0.25, tpi=20, ext=True),
    ):
        profile = thr.thread(bld)
        sdf = new_sdf2(profile)
        bb = profile.bounds()
        inside = [0.0, 0.5 * float(bb.max[1])]  # on the tooth centerline
        outside = [0.0, 2.0 * float(bb.max[1])]
        d = sdf.evaluate(np.array([inside, outside], np.float32))
        assert d[0] < 0, f"{type(thr).__name__}: inside point positive"
        assert d[1] > 0, f"{type(thr).__name__}: outside point negative"
