"""Seeded PRNG discipline.

The reference seeds ``random`` / ``torch.manual_seed`` globally
(/root/reference/dcgan/train.py:181-183). JAX is functional: every source of
randomness is an explicit key. ``KeySeq`` is a tiny stateful convenience
wrapper for host-side loops (file shuffling, epoch keys); inside jitted code
keys are always passed explicitly.
"""

from __future__ import annotations

import jax


class KeySeq:
    """A splittable stream of PRNG keys.

    >>> ks = KeySeq(369)
    >>> k1 = ks.next()
    >>> k2 = ks.next()   # distinct from k1, deterministic given the seed
    """

    def __init__(self, seed: int | jax.Array = 369):
        if isinstance(seed, int):
            self._key = jax.random.PRNGKey(seed)
        else:
            self._key = seed

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int) -> jax.Array:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return jax.numpy.stack(subs)

    def fold_in(self, data: int) -> jax.Array:
        return jax.random.fold_in(self._key, data)

    @property
    def state(self) -> jax.Array:
        """Raw key for checkpointing; restore with ``KeySeq(saved_state)``
        to continue the exact same key stream across a resume."""
        return self._key


DEFAULT_SEED = 369  # the reference's seed (dcgan/train.py:181)
