"""V12 general (convex) polygon∩polygon clip: Sutherland-Hodgman against a
convex clip ring, cross-checked by the independent slab-sweep
intersection_area — two different exact algorithms must agree to float
noise on random boxes, stars (concave), holed polygons, and circles
(reference clip use: data_prep/vegetation/xx_fiona_testing.py:133-150,
buffer.intersection(veg_geom) per intersecting vegetation polygon).
"""

import numpy as np
import pytest

from balrog_spark import geometry


def _box(x1, y1, x2, y2):
    return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], dtype=float)


def _star(cx, cy, rng, n=12, rmin=10.0, rmax=60.0):
    """Random star-shaped (concave, simple) ring around (cx, cy)."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(rmin, rmax, n)
    return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)],
                    axis=1)


def test_convex_clip_matches_box_clip():
    rng = np.random.default_rng(7)
    for _ in range(50):
        ring = _star(0, 0, rng)
        x1, y1 = rng.uniform(-40, 0, 2)
        x2, y2 = x1 + rng.uniform(10, 80), y1 + rng.uniform(10, 80)
        a = geometry.clip_ring_to_box(ring, x1, y1, x2, y2)
        b = geometry.clip_ring_to_convex(ring, _box(x1, y1, x2, y2))
        aa = geometry.ring_area(a) if len(a) >= 3 else 0.0
        ab = geometry.ring_area(b) if len(b) >= 3 else 0.0
        assert aa == pytest.approx(ab, abs=1e-9)


def test_convex_clip_orientation_invariant():
    ring = _box(0, 0, 10, 10)
    clip_ccw = geometry.buffer_point(5, 5, 6, quad_segs=4)
    clip_cw = clip_ccw[::-1]
    a = geometry.ring_area(geometry.clip_ring_to_convex(ring, clip_ccw))
    b = geometry.ring_area(geometry.clip_ring_to_convex(ring, clip_cw))
    assert a == pytest.approx(b, rel=1e-12)
    assert 0 < a < 100.0


def test_clip_area_equals_slab_intersection_boxes():
    rng = np.random.default_rng(11)
    for _ in range(60):
        bx = _box(*rng.uniform(-50, 0, 2), *rng.uniform(5, 90, 2))
        buf = geometry.buffer_point(*rng.uniform(-20, 40, 2),
                                    rng.uniform(5, 70), quad_segs=4)
        clipped = geometry.clip_ring_to_convex(bx, buf)
        a_sh = geometry.ring_area(clipped) if len(clipped) >= 3 else 0.0
        a_sw = geometry.intersection_area([[bx]], [[buf]])
        assert a_sh == pytest.approx(a_sw, abs=1e-6)


def test_clip_area_equals_slab_intersection_concave():
    rng = np.random.default_rng(13)
    for _ in range(40):
        star = _star(*rng.uniform(-15, 15, 2), rng)
        buf = geometry.buffer_point(*rng.uniform(-20, 20, 2),
                                    rng.uniform(10, 60), quad_segs=4)
        clipped = geometry.clip_ring_to_convex(star, buf)
        # SH of a concave subject may carry zero-width bridges: SIGNED
        # shoelace area is still exact
        a_sh = geometry.ring_area(clipped) if len(clipped) >= 3 else 0.0
        a_sw = geometry.intersection_area([[star]], [[buf]])
        assert a_sh == pytest.approx(a_sw, abs=1e-6)


def test_clip_polys_holed_area_matches_slab():
    rng = np.random.default_rng(17)
    for _ in range(30):
        x1, y1 = rng.uniform(-40, -10, 2)
        x2, y2 = x1 + rng.uniform(30, 70), y1 + rng.uniform(30, 70)
        hx1 = x1 + (x2 - x1) * 0.3
        hy1 = y1 + (y2 - y1) * 0.3
        hx2 = x1 + (x2 - x1) * 0.6
        hy2 = y1 + (y2 - y1) * 0.6
        holed = [_box(x1, y1, x2, y2), _box(hx1, hy1, hx2, hy2)]
        buf = geometry.buffer_point(*rng.uniform(-30, 30, 2),
                                    rng.uniform(15, 60), quad_segs=4)
        pieces = geometry.clip_polys_to_convex([holed], buf)
        a_sh = sum(geometry.polygon_area(p) for p in pieces)
        a_sw = geometry.intersection_area([holed], [[buf]])
        assert a_sh == pytest.approx(a_sw, abs=1e-6)


def test_intersection_area_disjoint_and_contained():
    a = _box(0, 0, 10, 10)
    b = _box(20, 20, 30, 30)
    assert geometry.intersection_area([[a]], [[b]]) == 0.0
    inner = _box(2, 2, 8, 8)
    assert geometry.intersection_area([[a]], [[inner]]) \
        == pytest.approx(36.0, rel=1e-12)
    # multi-part A union overlapping parts vs B
    a2 = [_box(0, 0, 6, 10)], [_box(4, 0, 10, 10)]
    assert geometry.intersection_area(list(a2), [[inner]]) \
        == pytest.approx(36.0, rel=1e-12)


def test_union_area_unchanged_after_refactor():
    # the refactored helpers must preserve union_area exactly
    a = _box(0, 0, 10, 10)
    b = _box(5, 0, 15, 10)
    assert geometry.union_area([[a], [b]]) == pytest.approx(150.0)
    holed = [_box(0, 0, 10, 10), _box(3, 3, 7, 7)]
    assert geometry.union_area([holed]) == pytest.approx(84.0)


# --- general (non-convex x non-convex) intersection geometry ---------------

def _rand_star(rng, cx, cy, n, rmin, rmax):
    """Random star-shaped simple polygon (strictly simple by angle sort)."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(rmin, rmax, n)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


def test_clip_polys_general_matches_area_and_containment():
    """clip_polys_general: trapezoid-decomposition intersection geometry
    must agree with the independent area sweep AND with pointwise
    (in A) & (in B) membership — concave x concave, holes, multiparts."""
    rng = np.random.default_rng(77)
    for trial in range(12):
        a = [[_rand_star(rng, 4, 4, rng.integers(5, 12), 1.0, 4.0)]]
        if trial % 3 == 0:      # multipart A
            a.append([_rand_star(rng, 9, 2, 6, 0.5, 2.0)])
        hole = np.array([(3.2, 3.2), (4.8, 3.2), (4.8, 4.8), (3.2, 4.8)])
        b = [[_rand_star(rng, 5, 4, rng.integers(5, 12), 2.0, 5.0),
              hole]]
        pieces = geometry.clip_polys_general(a, b)
        area = sum(geometry.polygon_area(p) for p in pieces)
        want = geometry.intersection_area(a, b)
        assert area == pytest.approx(want, abs=1e-9), trial
        px = rng.uniform(-1, 11, 3000)
        py = rng.uniform(-2, 10, 3000)
        got = geometry.points_in_geom(px, py, pieces) if pieces \
            else np.zeros(3000, bool)
        exp = geometry.points_in_geom(px, py, a) \
            & geometry.points_in_geom(px, py, b)
        assert (got == exp).all(), trial


def test_clip_polys_general_agrees_with_convex_path():
    """For CONVEX subjects the SH path and the general slab clip must
    agree (and both match the area sweep). For CONCAVE subjects SH is
    NOT trustworthy — the third block pins a case where SH's bridged
    output area diverges from the sweep while the general clip matches,
    which is exactly why veg_factors dispatches on ring_is_convex."""
    rng = np.random.default_rng(78)
    buf = geometry.buffer_point(5.0, 5.0, 3.0, quad_segs=4)
    for _ in range(8):
        # convex subjects: random buffers (always convex)
        subj = geometry.buffer_point(rng.uniform(2, 8), rng.uniform(2, 8),
                                     rng.uniform(1, 4),
                                     quad_segs=int(rng.integers(2, 5)))
        assert geometry.ring_is_convex(subj)
        a_convex = sum(geometry.polygon_area(p) for p in
                       geometry.clip_polys_to_convex([[subj]], buf))
        a_general = sum(geometry.polygon_area(p) for p in
                        geometry.clip_polys_general([[subj]], [[buf]]))
        a_sweep = geometry.intersection_area([[subj]], [[buf]])
        assert a_general == pytest.approx(a_sweep, abs=1e-9)
        assert a_convex == pytest.approx(a_sweep, abs=1e-9)

    # concave counterexample: seed 78 trial 7 of the star generator
    # (SH 3.00 vs true 3.28) — the general clip matches the sweep, SH
    # does not
    rng = np.random.default_rng(78)
    stars = [_rand_star(rng, 5, 5, rng.integers(4, 10), 1.0, 5.0)
             for _ in range(8)]
    subj = stars[7]
    assert not geometry.ring_is_convex(subj)
    a_sh = sum(geometry.polygon_area(p) for p in
               geometry.clip_polys_to_convex([[subj]], buf))
    a_general = sum(geometry.polygon_area(p) for p in
                    geometry.clip_polys_general([[subj]], [[buf]]))
    a_sweep = geometry.intersection_area([[subj]], [[buf]])
    assert a_general == pytest.approx(a_sweep, abs=1e-9)
    assert abs(a_sh - a_sweep) > 0.1


def test_clip_polys_general_disjoint_and_degenerate():
    box = [[np.array([(0, 0), (2, 0), (2, 2), (0, 2)], float)]]
    far = [[np.array([(10, 10), (12, 10), (12, 12), (10, 12)], float)]]
    assert geometry.clip_polys_general(box, far) == []
    assert geometry.clip_polys_general(box, []) == []
    # containment: B inside A -> intersection == B's area
    inner = [[np.array([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5),
                        (0.5, 1.5)], float)]]
    pieces = geometry.clip_polys_general(box, inner)
    assert sum(geometry.polygon_area(p) for p in pieces) \
        == pytest.approx(1.0, abs=1e-12)


def test_ring_is_convex_rejects_self_intersecting_star():
    """Same-sign turns alone also hold for a pentagram (720 deg total
    turning) — exactly the self-intersecting subject SH bridges
    wrongly; the turning-number term must route it to the general
    clip."""
    import math
    star = [(math.cos(math.radians(90 + 144 * i)),
             math.sin(math.radians(90 + 144 * i))) for i in range(5)]
    assert not geometry.ring_is_convex(star)
    gon = [(math.cos(k * math.pi / 8), math.sin(k * math.pi / 8))
           for k in range(16)]
    assert geometry.ring_is_convex(gon)


def test_band_filter_bounds_giant_subject_against_small_clip():
    """The slab sweep prunes to the x-band where the two x-ranges
    overlap: a 20k-vertex comb subject against a 3-unit-wide box
    completes in the box's band (the unpruned pairwise breakpoint
    matrix would be 20k^2 ~ 3.2 GB) and the area is analytically
    exact."""
    import time

    teeth = 5000
    pts = [(0.0, 0.0)]
    for t in range(teeth):
        x = 2.0 * t
        pts += [(x, 100.0), (x + 1.0, 100.0), (x + 1.0, 0.0),
                (x + 2.0, 0.0)]
    pts += [(2.0 * teeth, -10.0), (0.0, -10.0)]
    subject = [[np.array(pts)]]
    # box spanning x in [200.25, 203.25], y in [50, 60]: tooth at
    # x=[200,201] contributes 0.75 width, tooth at [202,203] a full 1.0
    # within-band, gaps contribute nothing above y=0
    box = [[np.array([(200.25, 50.0), (203.25, 50.0),
                      (203.25, 60.0), (200.25, 60.0)])]]
    t0 = time.time()
    area = geometry.intersection_area(subject, box)
    pieces = geometry.clip_polys_general(subject, box)
    wall = time.time() - t0
    expect = (0.75 + 1.0) * 10.0
    assert abs(area - expect) < 1e-9
    got = sum(geometry.ring_area(p[0]) for p in pieces)
    assert abs(got - expect) < 1e-9
    assert wall < 5.0, f"band filter did not prune: {wall:.1f}s"
