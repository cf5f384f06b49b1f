"""Factor-distribution algebra, compiled to JAX samplers and contains-masks.

TPU-native rebuild of /root/reference/spriteworld/factor_distributions.py.
The same 7-node set-theoretic algebra (Continuous, Discrete, Mixture,
Intersection, Product, SetMinus, Selection) is preserved, but each node
compiles to pure functions:

  * ``sample(key) -> dict[str, f32 scalar]``   — traceable, vmappable; the
    rejection-sampled nodes (Intersection/SetMinus/Selection) lower to a
    bounded ``lax.while_loop`` that exits as soon as a candidate is accepted.
  * ``contains(spec) -> bool array``           — fully vectorized over any
    batch of factor values, so a single call evaluates the mask for all
    sprites of all envs at once (this is what tasks use as sprite filters).

Structural validation (key-set checks) happens eagerly at construction time
on the host, mirroring the reference's ValueErrors
(factor_distributions.py:185-190, 232-237, 296-301, 330-335, 381-386).

Shape names are resolved to their float ShapeType ids at construction, since
the engine state stores shapes numerically.

Semantics preserved exactly (see SURVEY.md §2.6):
  * ``Continuous.contains`` is half-open ``[minval, maxval)``.
  * ``Continuous.sample`` casts through ``dtype`` (int dtypes truncate), so an
    int-dtype Continuous(0, 1) always samples 0.
  * ``contains`` on a spec lacking the key raises KeyError (at trace time).
  * Mixtures sample component-by-probability; Intersection samples from
    ``index_for_sampling`` and rejects with the rest.
"""

from __future__ import annotations

import abc
from typing import Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spriteworld_tpu import constants

# Bound for rejection-sampling loops, matching the reference's _MAX_TRIES=1e5
# (factor_distributions.py:45). Inside jit the loop exits on acceptance, so
# this only prices in on over-constrained distributions — which the reference
# handles by raising (factor_distributions.py:248-249) and we handle by
# returning ok=False from `sample_with_status` (raised host-side by the
# dm_env adapter; surfaced as EnvState.sample_ok in the batched engine).
MAX_REJECTION_TRIES = 100_000

Spec = Dict[str, jnp.ndarray]


def _resolve(key: str, value):
    """Map shape names to ShapeType ids; pass everything else through."""
    if key == "shape" and isinstance(value, str):
        return float(constants.ShapeType[value].value)
    return value


class AbstractDistribution(abc.ABC):
    """Base class: a distribution over factor dicts ("specs")."""

    def sample(self, key) -> Spec:
        """Sample a spec (dict of f32 scalars) using PRNG `key`. Traceable."""
        return self.sample_with_status(key)[0]

    def sample_with_status(self, key):
        """(spec, ok: bool scalar) — ok=False when a bounded rejection loop
        exhausted MAX_REJECTION_TRIES without finding an in-support sample
        (the jit-safe analogue of the reference's ValueError,
        factor_distributions.py:248-249).

        Custom distributions may override either method; a `sample`-only
        subclass gets an always-ok status shim here.
        """
        if type(self).sample is AbstractDistribution.sample:
            raise NotImplementedError(
                "AbstractDistribution subclasses must implement sample() or "
                "sample_with_status().")
        return self.sample(key), jnp.bool_(True)

    @abc.abstractmethod
    def contains(self, spec: Spec) -> jnp.ndarray:
        """Vectorized support check; broadcasts over batched spec values."""

    @abc.abstractmethod
    def to_str(self, indent: int) -> str:
        """Recursive description (reference: factor_distributions.py:66-67)."""

    @property
    @abc.abstractmethod
    def keys(self) -> frozenset:
        """The set of factor keys this distribution produces."""

    def __str__(self):
        return self.to_str(indent=0)

    def _require_keys(self, spec: Spec):
        for k in self.keys:
            if k not in spec:
                raise KeyError(
                    f"key {k} is not in spec {sorted(spec)}, but must be to "
                    "evaluate containment.")


class Continuous(AbstractDistribution):
    """Uniform distribution on the half-open interval [minval, maxval)."""

    def __init__(self, key: str, minval, maxval, dtype="float32"):
        self.key = key
        self.minval = minval
        self.maxval = maxval
        self.dtype = dtype

    def sample_with_status(self, key):
        v = jax.random.uniform(
            key, (), jnp.float32, self.minval, self.maxval)
        # np.cast-style conversion: int dtypes truncate toward zero
        # (factor_distributions.py:101-103).
        v = v.astype(self.dtype).astype(jnp.float32)
        return {self.key: v}, jnp.bool_(True)

    def contains(self, spec: Spec) -> jnp.ndarray:
        self._require_keys(spec)
        v = spec[self.key]
        return (v >= self.minval) & (v < self.maxval)

    def to_str(self, indent):
        s = (f"<Continuous: key={self.key}, minval={self.minval}, "
             f"maxval={self.maxval}, dtype={self.dtype}>")
        return indent * "  " + s

    @property
    def keys(self):
        return frozenset([self.key])


class Discrete(AbstractDistribution):
    """Discrete distribution over a finite candidate set."""

    def __init__(self, key: str, candidates: Sequence, probs=None):
        self.key = key
        self.raw_candidates = list(candidates)
        self.candidates = np.asarray(
            [_resolve(key, c) for c in candidates], dtype=np.float32)
        self.probs = None if probs is None else np.asarray(probs)

    def sample_with_status(self, key):
        idx = jax.random.choice(
            key, len(self.candidates),
            p=None if self.probs is None else jnp.asarray(self.probs))
        return {self.key: jnp.asarray(self.candidates)[idx]}, jnp.bool_(True)

    def contains(self, spec: Spec) -> jnp.ndarray:
        self._require_keys(spec)
        v = spec[self.key]
        return jnp.any(
            v[..., None] == jnp.asarray(self.candidates), axis=-1)

    def to_str(self, indent):
        s = (f"<Discrete: key={self.key}, candidates={self.raw_candidates}, "
             f"probs={self.probs}>")
        return indent * "  " + s

    @property
    def keys(self):
        return frozenset([self.key])


def _same_keys_check(components, what):
    keys = components[0].keys
    for c in components[1:]:
        if c.keys != keys:
            raise ValueError(
                f"All {what} components must have the same key sets; got "
                f"{sorted(keys)} and {sorted(c.keys)}")
    return keys


def _spec_select(pred, a: Spec, b: Spec) -> Spec:
    return {k: jnp.where(pred, a[k], b[k]) for k in a}


def _rejection_sample(key, propose, accept):
    """Bounded do-while rejection loop: propose until accepted.

    `propose(key) -> (Spec, ok)`, `accept(Spec) -> bool`. Inside jit we
    cannot raise on exhaustion like the reference
    (factor_distributions.py:248-249); the loop is bounded by
    MAX_REJECTION_TRIES and the returned `ok` flag records whether the final
    candidate was actually accepted (AND the proposal's own status, since
    nested rejection nodes propagate theirs).

    Child exhaustion fails FAST: when a nested rejection node returns
    ok=False (it burned its own MAX_REJECTION_TRIES), the outer loop
    stops instead of re-proposing — the reference raises out of the
    whole sample at that point (factor_distributions.py:343-344), and
    retrying a child that just exhausted 1e5 tries would multiply the
    bounds into O(MAX^depth) work for over-constrained nestings.
    """
    k0, k1 = jax.random.split(key)
    first, ok0 = propose(k1)

    def cond(carry):
        _, spec, child_ok, tries = carry
        return (~accept(spec)) & child_ok & (tries < MAX_REJECTION_TRIES)

    def body(carry):
        k, _, _, tries = carry
        k, sub = jax.random.split(k)
        spec, ok = propose(sub)
        return k, spec, ok, tries + 1

    _, spec, child_ok, _ = jax.lax.while_loop(
        cond, body, (k0, first, jnp.asarray(ok0), jnp.int32(1)))
    return spec, accept(spec) & child_ok


class Mixture(AbstractDistribution):
    """Mixture of same-keyed components with optional probabilities."""

    def __init__(self, components, probs=None):
        self.components = list(components)
        self.probs = (np.ones(len(self.components)) / len(self.components)
                      if probs is None else np.asarray(probs))
        self._keys = _same_keys_check(self.components, "Mixture")

    def sample_with_status(self, key):
        k_choice, k_sample = jax.random.split(key)
        idx = jax.random.choice(
            k_choice, len(self.components), p=jnp.asarray(self.probs))
        branches = [
            (lambda k, c=c: c.sample_with_status(k)) for c in self.components]
        return jax.lax.switch(idx, branches, k_sample)

    def contains(self, spec: Spec) -> jnp.ndarray:
        results = [c.contains(spec) for c in self.components]
        return jnp.any(jnp.stack(jnp.broadcast_arrays(*results)), axis=0)

    def to_str(self, indent):
        inner = ",\n".join(c.to_str(indent + 2) for c in self.components)
        return (indent * "  " + "<Mixture:\n" + (indent + 1) * "  "
                + f"components=[\n{inner},\n" + (indent + 1) * "  " + "],\n"
                + (indent + 1) * "  " + f"probs={self.probs}>")

    @property
    def keys(self):
        return self._keys


class Intersection(AbstractDistribution):
    """Intersection via rejection sampling from one component."""

    def __init__(self, components, index_for_sampling: int = 0):
        self.components = list(components)
        self.index_for_sampling = index_for_sampling
        self._keys = _same_keys_check(self.components, "Intersection")

    def sample_with_status(self, key):
        proposal = self.components[self.index_for_sampling]
        return _rejection_sample(
            key, proposal.sample_with_status, lambda s: self.contains(s))

    def contains(self, spec: Spec) -> jnp.ndarray:
        results = [c.contains(spec) for c in self.components]
        return jnp.all(jnp.stack(jnp.broadcast_arrays(*results)), axis=0)

    def to_str(self, indent):
        inner = ",\n".join(c.to_str(indent + 2) for c in self.components)
        return (indent * "  " + "<Intersection:\n" + (indent + 1) * "  "
                + f"components=[\n{inner},\n" + (indent + 1) * "  " + "],\n"
                + (indent + 1) * "  "
                + f"index_for_sampling={self.index_for_sampling}>")

    @property
    def keys(self):
        return self._keys


class Product(AbstractDistribution):
    """Product of components with disjoint key sets."""

    def __init__(self, components):
        self.components = list(components)
        all_keys = [c.keys for c in self.components]
        union = frozenset().union(*all_keys) if all_keys else frozenset()
        total = sum(len(k) for k in all_keys)
        if len(union) < total:
            raise ValueError(
                "All Product components must have different keys, yet there "
                f"are {total - len(union)} overlapping keys.")
        self._keys = union

    def sample_with_status(self, key):
        out: Spec = {}
        ok = jnp.bool_(True)
        for c, sub in zip(self.components,
                          jax.random.split(key, len(self.components))):
            spec, c_ok = c.sample_with_status(sub)
            out.update(spec)
            ok = ok & c_ok
        return out, ok

    def contains(self, spec: Spec) -> jnp.ndarray:
        results = [c.contains(spec) for c in self.components]
        return jnp.all(jnp.stack(jnp.broadcast_arrays(*results)), axis=0)

    def to_str(self, indent):
        inner = ",\n".join(c.to_str(indent + 2) for c in self.components)
        return (indent * "  " + "<Product:\n" + (indent + 1) * "  "
                + f"components=[\n{inner},\n" + (indent + 1) * "  " + "]>")

    @property
    def keys(self):
        return self._keys


class SetMinus(AbstractDistribution):
    """base \\ hold_out, via rejection sampling."""

    def __init__(self, base, hold_out):
        self.base = base
        self.hold_out = hold_out
        self._keys = base.keys
        if not hold_out.keys.issubset(self._keys):
            raise ValueError(
                f"Keys {sorted(hold_out.keys)} of hold_out is not a subset of "
                f"keys {sorted(base.keys)} of SetMinus base distribution.")

    def sample_with_status(self, key):
        return _rejection_sample(
            key, self.base.sample_with_status,
            lambda s: ~self.hold_out.contains(s))

    def contains(self, spec: Spec) -> jnp.ndarray:
        return self.base.contains(spec) & ~self.hold_out.contains(spec)

    def to_str(self, indent):
        return (indent * "  " + "<SetMinus:\n" + (indent + 1) * "  "
                + f"base=\n{self.base.to_str(indent + 2)},\n"
                + (indent + 1) * "  "
                + f"hold_out=\n{self.hold_out.to_str(indent + 2)}>")

    @property
    def keys(self):
        return self._keys


class Selection(AbstractDistribution):
    """Samples of `base` accepted by `filtering` (subset-keyed)."""

    def __init__(self, base, filtering):
        self.base = base
        self.filtering = filtering
        self._keys = base.keys
        if not filtering.keys.issubset(self._keys):
            raise ValueError(
                f"Keys {sorted(filtering.keys)} of filtering is not a subset "
                f"of keys {sorted(base.keys)} of Selection base distribution.")

    def sample_with_status(self, key):
        return _rejection_sample(
            key, self.base.sample_with_status,
            lambda s: self.filtering.contains(s))

    def contains(self, spec: Spec) -> jnp.ndarray:
        return self.base.contains(spec) & self.filtering.contains(spec)

    def to_str(self, indent):
        return (indent * "  " + "<Selection:\n" + (indent + 1) * "  "
                + f"base=\n{self.base.to_str(indent + 2)},\n"
                + (indent + 1) * "  "
                + f"filtering=\n{self.filtering.to_str(indent + 2)}>")

    @property
    def keys(self):
        return self._keys
