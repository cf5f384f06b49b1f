"""Distribution algebra: sampling support, containment parity, error cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import distributions as distribs

import ref_oracle


def _sample_many(dist, n=200, seed=0):
    keys = jax.random.split(jax.random.key(seed), n)
    return jax.jit(jax.vmap(dist.sample))(keys)


def _assert_samples_contained(dist, n=200):
    samples = _sample_many(dist, n)
    contained = np.asarray(dist.contains(samples))
    assert contained.all()


def test_continuous_support():
    d = distribs.Continuous("x", 0.2, 0.7)
    s = np.asarray(_sample_many(d)["x"])
    assert (s >= 0.2).all() and (s < 0.7).all()
    _assert_samples_contained(d)
    # Half-open interval semantics (reference :105-111)
    assert bool(d.contains({"x": jnp.float32(0.2)}))
    assert not bool(d.contains({"x": jnp.float32(0.7)}))
    assert not bool(d.contains({"x": jnp.float32(0.1)}))


def test_continuous_int_dtype_truncates():
    # np.cast-style: int-dtype Continuous(0, 1) always samples 0
    # (reference tests/factor_distributions_test.py pins this semantics).
    d = distribs.Continuous("x", 0, 1, dtype="int32")
    s = np.asarray(_sample_many(d)["x"])
    assert (s == 0).all()
    d2 = distribs.Continuous("angle", 0, 360, dtype="int32")
    s2 = np.asarray(_sample_many(d2)["angle"])
    assert (s2 == np.trunc(s2)).all()


def test_continuous_missing_key_raises():
    d = distribs.Continuous("x", 0, 1)
    with pytest.raises(KeyError):
        d.contains({"y": jnp.float32(0.5)})


def test_discrete():
    d = distribs.Discrete("scale", [0.1, 0.2, 0.3])
    s = np.asarray(_sample_many(d)["scale"])
    cands = np.asarray([0.1, 0.2, 0.3], np.float32)
    assert np.isclose(s[:, None], cands[None, :], atol=1e-7).any(axis=1).all()
    _assert_samples_contained(d)
    assert not bool(d.contains({"scale": jnp.float32(0.15)}))


def test_discrete_shapes_resolve_to_ids():
    d = distribs.Discrete("shape", ["square", "triangle", "circle"])
    s = np.asarray(_sample_many(d)["shape"])
    assert set(np.unique(s)).issubset({1.0, 2.0, 6.0})
    assert bool(d.contains({"shape": jnp.float32(2.0)}))
    assert not bool(d.contains({"shape": jnp.float32(3.0)}))


def test_discrete_probs():
    d = distribs.Discrete("x", [0.0, 1.0], probs=[0.9, 0.1])
    s = np.asarray(_sample_many(d, n=500)["x"])
    assert (s == 0).mean() > 0.75


def test_mixture():
    d = distribs.Mixture([
        distribs.Continuous("x", 0.0, 0.1),
        distribs.Continuous("x", 0.9, 1.0),
    ])
    s = np.asarray(_sample_many(d, 300)["x"])
    assert ((s < 0.1) | (s >= 0.9)).all()
    assert (s < 0.1).any() and (s >= 0.9).any()
    _assert_samples_contained(d)
    assert not bool(d.contains({"x": jnp.float32(0.5)}))


def test_mixture_key_mismatch_raises():
    with pytest.raises(ValueError):
        distribs.Mixture([
            distribs.Continuous("x", 0, 1),
            distribs.Continuous("y", 0, 1),
        ])


def test_product_and_overlap_error():
    d = distribs.Product([
        distribs.Continuous("x", 0, 1),
        distribs.Discrete("shape", ["square"]),
    ])
    samples = _sample_many(d)
    assert set(samples) == {"x", "shape"}
    _assert_samples_contained(d)
    with pytest.raises(ValueError):
        distribs.Product([
            distribs.Continuous("x", 0, 1),
            distribs.Continuous("x", 0, 2),
        ])


def test_intersection():
    d = distribs.Intersection([
        distribs.Continuous("x", 0.0, 0.6),
        distribs.Continuous("x", 0.4, 1.0),
    ])
    s = np.asarray(_sample_many(d)["x"])
    assert (s >= 0.4).all() and (s < 0.6).all()
    _assert_samples_contained(d)


def test_setminus():
    d = distribs.SetMinus(
        distribs.Product([
            distribs.Continuous("x", 0.0, 1.0),
            distribs.Continuous("y", 0.0, 1.0),
        ]),
        distribs.Product([
            distribs.Continuous("x", 0.5, 1.0),
            distribs.Continuous("y", 0.5, 1.0),
        ]))
    samples = _sample_many(d, 300)
    x, y = np.asarray(samples["x"]), np.asarray(samples["y"])
    assert not ((x >= 0.5) & (y >= 0.5)).any()
    _assert_samples_contained(d)
    with pytest.raises(ValueError):
        distribs.SetMinus(
            distribs.Continuous("x", 0, 1), distribs.Continuous("y", 0, 1))


def test_selection():
    d = distribs.Selection(
        distribs.Product([
            distribs.Continuous("x", 0.0, 1.0),
            distribs.Continuous("c0", 0.0, 1.0),
        ]),
        distribs.Continuous("c0", 0.0, 0.3))
    s = np.asarray(_sample_many(d)["c0"])
    assert (s < 0.3).all()
    _assert_samples_contained(d)


def test_contains_parity_with_reference():
    """Random specs evaluated by both algebras must agree."""
    ref_fd = ref_oracle.ref_module("factor_distributions")

    def build(mod):
        return mod.SetMinus(
            mod.Product([
                mod.Continuous("x", 0.1, 0.9),
                mod.Continuous("y", 0.1, 0.9),
                mod.Discrete("scale", [0.13]),
            ]),
            mod.Product([
                mod.Continuous("x", 0.5, 0.9),
                mod.Continuous("y", 0.5, 0.9),
            ]))

    ours, theirs = build(distribs), build(ref_fd)
    rng = np.random.default_rng(3)
    for _ in range(100):
        spec = {
            "x": np.float32(rng.uniform(0, 1)),
            "y": np.float32(rng.uniform(0, 1)),
            "scale": np.float32(rng.choice([0.13, 0.2])),
        }
        ref_spec = {k: float(v) for k, v in spec.items()}
        # Discrete equality: reference compares python floats; cast
        # candidates to f32 for a fair comparison.
        ref_spec["scale"] = float(np.float32(ref_spec["scale"]))
        theirs_fixed = build(ref_fd)
        theirs_fixed.base.components[2].candidates = [float(np.float32(0.13))]
        assert bool(ours.contains({k: jnp.asarray(v) for k, v in spec.items()})) \
            == bool(theirs_fixed.contains(ref_spec))


def test_vectorized_contains_broadcasts():
    d = distribs.Continuous("x", 0.2, 0.8)
    xs = jnp.linspace(0, 1, 11)
    out = np.asarray(d.contains({"x": xs}))
    assert out.shape == (11,)
    np.testing.assert_array_equal(out, (np.asarray(xs) >= 0.2)
                                  & (np.asarray(xs) < 0.8))


def test_to_str_runs():
    d = distribs.Mixture([
        distribs.Continuous("x", 0, 1),
        distribs.Continuous("x", 2, 3),
    ])
    assert "Mixture" in str(d) and "Continuous" in str(d)


def test_rejection_exhaustion_reports_not_ok():
    """An over-constrained SetMinus flags ok=False instead of looping
    forever; the reference raises ValueError here
    (factor_distributions.py:248-249, pinned by its
    tests/factor_distributions_test.py:172-177)."""
    import jax

    impossible = distribs.SetMinus(
        distribs.Continuous("x", 0.0, 1.0),
        distribs.Continuous("x", -1.0, 2.0))
    spec, ok = jax.jit(impossible.sample_with_status)(jax.random.key(0))
    assert not bool(ok)
    assert "x" in spec

    # Status propagates through composition (Product of ok and not-ok).
    prod = distribs.Product(
        [impossible, distribs.Continuous("y", 0.0, 1.0)])
    _, ok = jax.jit(prod.sample_with_status)(jax.random.key(1))
    assert not bool(ok)

    possible = distribs.SetMinus(
        distribs.Continuous("x", 0.0, 1.0),
        distribs.Continuous("x", 0.0, 0.5))
    spec, ok = jax.jit(possible.sample_with_status)(jax.random.key(2))
    assert bool(ok)
    assert 0.5 <= float(spec["x"]) < 1.0


def test_random_composition_parity_fuzz():
    """Randomized compositional parity: random spec TREES (Mixture /
    Intersection / SetMinus / Product over Continuous leaves) built
    identically in both algebras must agree on `contains` for random
    candidates, and our samples must be contained by the reference tree.

    Bounds and candidates live on the 1/64 grid (exact in f32 AND f64),
    so the reference's python-float comparisons and our f32 comparisons
    are bit-equivalent — any disagreement is a real semantic divergence.
    """
    ref_fd = ref_oracle.ref_module("factor_distributions")
    rng = np.random.default_rng(42)

    def grid(lo=0.0, hi=1.0):
        vals = np.arange(int(lo * 64), int(hi * 64) + 1) / 64.0
        return float(rng.choice(vals))

    def rand_tree(key_name, depth):
        """Returns (build_fn(mod) -> dist) for one factor key."""
        kind = rng.choice(
            ["leaf", "mixture", "intersection", "setminus"]
            if depth > 0 else ["leaf"])
        if kind == "leaf":
            a = grid(0.0, 0.9)
            b = grid(a + 1 / 64, 1.0)
            return lambda mod: mod.Continuous(key_name, a, b)
        lhs = rand_tree(key_name, depth - 1)
        rhs = rand_tree(key_name, depth - 1)
        if kind == "mixture":
            return lambda mod: mod.Mixture([lhs(mod), rhs(mod)])
        if kind == "intersection":
            return lambda mod: mod.Intersection([lhs(mod), rhs(mod)])
        return lambda mod: mod.SetMinus(lhs(mod), rhs(mod))

    for case in range(8):
        tx = rand_tree("x", depth=2)
        ty = rand_tree("y", depth=2)
        build = lambda mod: mod.Product([tx(mod), ty(mod)])  # noqa: B023
        ours, theirs = build(distribs), build(ref_fd)
        cfun = jax.jit(ours.contains)  # one compile per tree

        # contains parity: half on-grid (boundary-heavy), half off-grid,
        # VECTORIZED through one jitted call per batch.
        cands = []
        for _ in range(40):
            if rng.uniform() < 0.5:
                cands.append((grid(), grid()))
            else:
                cands.append((float(np.float32(rng.uniform(0, 1))),
                              float(np.float32(rng.uniform(0, 1)))))
        xs = jnp.asarray([c[0] for c in cands], jnp.float32)
        ys = jnp.asarray([c[1] for c in cands], jnp.float32)
        got = np.asarray(cfun({"x": xs, "y": ys}))
        for i, (cx, cy) in enumerate(cands):
            want = bool(theirs.contains({"x": cx, "y": cy}))
            assert bool(got[i]) == want, (case, cx, cy)

        # our samples (when the bounded rejection loop succeeds) must be
        # members of the reference tree.
        sfun = jax.jit(ours.sample_with_status)
        for s in range(5):
            spec, ok = sfun(jax.random.key(case * 31 + s))
            if not bool(np.asarray(ok).all()):
                continue  # over-constrained tree: status surfaced, skip
            host = {k: float(np.asarray(v)) for k, v in spec.items()}
            assert theirs.contains(host), (case, host)
