"""Device-resident frame-shuffling cache.

Re-implements the Cache/CuCache semantics (TNetLib/Cache.cc,
CuTNetLib/cuCache.cc): EMPTY→INTAKE→FULL→EXHAUST state machine, leftover
carry-over between fills, host-generated permutation (bit-exact
srand48 + std::random_shuffle order via utils.rand48) with the row gather
on device, fixed-size bunches with the trailing remainder discarded.
"""

from __future__ import annotations

import time
from typing import Iterator, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.rand48 import Rand48


class FrameCache:
    def __init__(self, cachesize: int, bunchsize: int, seed: int = 0,
                 randomize: bool = True):
        if cachesize % bunchsize != 0:
            raise ValueError(
                f"Non divisible cachesize {cachesize} by bunchsize {bunchsize}")
        self.cachesize = cachesize
        self.bunchsize = bunchsize
        self.randomize = randomize
        if seed == 0:
            seed = int(time.time())
        self.rng = Rand48(seed)
        self._feats: List[jnp.ndarray] = []
        self._labels: List[np.ndarray] = []
        self._rows = 0
        self._leftover: Optional[Tuple[jnp.ndarray, np.ndarray]] = None
        self.discarded = 0

    # -- intake -------------------------------------------------------------

    def _take_leftover(self) -> None:
        if self._leftover is not None:
            f, l = self._leftover
            self._leftover = None
            if f.shape[0] > self.cachesize:
                # Too small cache: truncate like Cache.cc:80-92
                f, l = f[:self.cachesize], l[:self.cachesize]
            self._feats.append(f)
            self._labels.append(l)
            self._rows += f.shape[0]

    def add(self, feats: jnp.ndarray, labels: np.ndarray) -> None:
        """Add one utterance (device feats (T, D), host int labels (T,))."""
        assert feats.shape[0] == labels.shape[0]
        if self._rows == 0:
            self._take_leftover()
        space = self.cachesize - self._rows
        if space <= 0:
            raise RuntimeError("AddData on full cache")
        fill = min(space, feats.shape[0])
        self._feats.append(feats[:fill])
        self._labels.append(labels[:fill])
        self._rows += fill
        if fill < feats.shape[0]:
            self._leftover = (feats[fill:], labels[fill:])

    def _stash_leftover(self, f, l) -> None:
        if self._leftover is None:
            self._leftover = (f, l)
        else:
            lf, ll = self._leftover
            self._leftover = (jnp.concatenate([lf, f], axis=0),
                              np.concatenate([ll, l]))

    def _append_up_to_capacity(self, f, l) -> None:
        space = self.cachesize - self._rows
        if space <= 0:
            self._stash_leftover(f, l)
            return
        fill = min(space, f.shape[0])
        self._feats.append(f[:fill])
        self._labels.append(l[:fill])
        self._rows += fill
        if fill < f.shape[0]:
            self._stash_leftover(f[fill:], l[fill:])

    def add_block(self, feats: jnp.ndarray, labels: np.ndarray) -> None:
        """Add a multi-utterance row block (the batched intake path: one
        device array per transform batch instead of per-utterance slices).
        Fills to capacity and keeps the remainder as leftover; unlike
        ``add``, no single-utterance truncation applies — a block is many
        utterances."""
        assert feats.shape[0] == labels.shape[0]
        if self._rows == 0 and self._leftover is not None:
            lf, ll = self._leftover
            self._leftover = None
            self._append_up_to_capacity(lf, ll)
        self._append_up_to_capacity(feats, labels)

    @property
    def full(self) -> bool:
        return self._rows >= self.cachesize

    @property
    def rows(self) -> int:
        return self._rows

    @property
    def has_leftover(self) -> bool:
        return self._leftover is not None

    def absorb_leftover(self) -> bool:
        """Pull the carried-over remainder into the (empty) cache; returns
        True if it alone fills the cache again (long utterances / large
        blocks). Remainder beyond capacity stays as leftover."""
        if self._rows == 0 and self._leftover is not None:
            lf, ll = self._leftover
            self._leftover = None
            self._append_up_to_capacity(lf, ll)
        return self.full

    # -- exhaust ------------------------------------------------------------

    def bunches(self) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Randomize (if enabled) and yield (feats, labels) bunches.

        Resets the cache to EMPTY afterwards; the partial tail bunch is
        discarded (Cache.cc:239-244).
        """
        if self._rows == 0:
            raise RuntimeError("GetBunch on empty cache")
        feats = self._feats[0] if len(self._feats) == 1 else jnp.concatenate(self._feats, axis=0)
        labels = self._labels[0] if len(self._labels) == 1 else np.concatenate(self._labels, axis=0)
        n = self._rows
        if self.randomize:
            perm = self.rng.permutation(n)
            feats = jnp.take(feats, jnp.asarray(perm), axis=0)
            labels = labels[perm]
        nb = n // self.bunchsize
        self.discarded += n - nb * self.bunchsize
        self._feats, self._labels, self._rows = [], [], 0
        for i in range(nb):
            s = i * self.bunchsize
            yield feats[s:s + self.bunchsize], jnp.asarray(labels[s:s + self.bunchsize])

    def take_stacked(self):
        """Randomize and return ((nb, bunch, D) feats, (nb, bunch) labels)
        for a scan-based drain; resets the cache. None if < one bunch."""
        if self._rows == 0:
            raise RuntimeError("take_stacked on empty cache")
        feats = self._feats[0] if len(self._feats) == 1 else jnp.concatenate(self._feats, axis=0)
        labels = self._labels[0] if len(self._labels) == 1 else np.concatenate(self._labels, axis=0)
        n = self._rows
        if self.randomize:
            perm = self.rng.permutation(n)
            feats = jnp.take(feats, jnp.asarray(perm), axis=0)
            labels = labels[perm]
        nb = n // self.bunchsize
        self.discarded += n - nb * self.bunchsize
        self._feats, self._labels, self._rows = [], [], 0
        if nb == 0:
            return None
        B = self.bunchsize
        feats = feats[:nb * B].reshape(nb, B, feats.shape[1])
        labels = jnp.asarray(labels[:nb * B].reshape(nb, B))
        return feats, labels
