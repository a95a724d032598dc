"""Network = ordered tuple of component specs + list of param dicts.

Replaces the reference's MMF tag factory + linked Component list
(TNetLib/Nnet.cc:162-354, CuTNetLib/cuNetwork.cc) with a declarative,
jit-friendly structure: specs are static/hashable, params are a pytree.
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..io.mmf import TokenStream
from .components import Component, TAG_TO_TYPE, Recurrent


def read_components(ts: TokenStream, stop_tag: Optional[str] = None):
    """Parse components from a token stream until EOF or ``stop_tag``.

    Mirrors Network::ComponentFactory (Nnet.cc:199-288): each component is
    ``<tag> nOutputs nInputs`` followed by its parameters.
    """
    specs: List[Component] = []
    params: List[dict] = []
    while True:
        tok = ts.peek()
        if tok is None:
            break
        tag = tok.lower()
        if stop_tag is not None and tag == stop_tag:
            ts.next()
            break
        if tag == "<endblock>":
            break
        if not (tag.startswith("<") and tag.endswith(">")):
            raise ValueError(f"Invalid component tag: {tok}")
        if tag not in TAG_TO_TYPE:
            raise ValueError(f"Unknown Component tag: {tok}")
        ts.next()
        n_outputs = int(ts.next())
        n_inputs = int(ts.next())
        if n_inputs <= 0 or n_outputs <= 0:
            raise ValueError(f"Bad dimensions for {tag}: {n_outputs} {n_inputs}")
        spec, p = TAG_TO_TYPE[tag].read(n_inputs, n_outputs, ts)
        specs.append(spec)
        params.append(p)
    return specs, params


def write_component(out, spec: Component, params: dict) -> None:
    """Write ``<tag> nOutputs nInputs`` + params (Nnet.cc:296-354)."""
    out.write(f"{spec.tag} {spec.n_outputs} {spec.n_inputs}\n")
    spec.write(out, params)


@dataclass
class Network:
    """An ordered feed-forward stack. ``specs`` static, ``params`` pytree."""

    specs: Tuple[Component, ...]
    params: List[dict]

    # -- constructors -------------------------------------------------------

    @classmethod
    def read(cls, source) -> "Network":
        """Read from a path, file object, or MMF text."""
        if isinstance(source, str) and "\n" not in source and "<" not in source:
            with open(source) as f:
                ts = TokenStream(f)
        else:
            ts = TokenStream(source)
        specs, params = read_components(ts)
        return cls(tuple(specs), params)

    def write(self, dest) -> None:
        if hasattr(dest, "write"):
            for spec, p in zip(self.specs, self.params):
                write_component(dest, spec, p)
        else:
            with open(dest, "w") as f:
                self.write(f)

    def to_text(self) -> str:
        buf = io.StringIO()
        self.write(buf)
        return buf.getvalue()

    # -- shape info ---------------------------------------------------------

    @property
    def n_inputs(self) -> int:
        return self.specs[0].n_inputs if self.specs else 0

    @property
    def n_outputs(self) -> int:
        return self.specs[-1].n_outputs if self.specs else 0

    def check_dims(self) -> None:
        for a, b in zip(self.specs[:-1], self.specs[1:]):
            if a.n_outputs != b.n_inputs:
                raise ValueError(
                    f"Component dimension mismatch: {a.tag}({a.n_outputs}) "
                    f"→ {b.tag}({b.n_inputs})")

    # -- compute ------------------------------------------------------------

    def apply(self, params: Sequence[dict], x: jnp.ndarray) -> jnp.ndarray:
        """Pure forward over the whole stack (Nnet.cc:65-91 analog)."""
        for spec, p in zip(self.specs, params):
            x = spec.apply(p, x)
        return x

    def forward(self, x) -> jnp.ndarray:
        """Convenience eager forward using the stored params."""
        return self.apply(self.params, jnp.asarray(x))

    def apply_upto(self, params, x, n_layers: int) -> jnp.ndarray:
        for spec, p in zip(self.specs[:n_layers], params[:n_layers]):
            x = spec.apply(p, x)
        return x

    # -- training metadata --------------------------------------------------

    def trainable_mask(self) -> List[dict]:
        """Pytree of bools marking parameters that receive gradients."""
        masks = []
        for spec, p in zip(self.specs, self.params):
            masks.append({k: (k in spec.trainable_keys) for k in p})
        return masks

    def has_recurrent(self) -> bool:
        return any(isinstance(s, Recurrent) for s in self.specs)

    # -- streaming inference -------------------------------------------------

    def feedforward(self, x: jnp.ndarray, start_frm_ext: int = 0,
                    end_frm_ext: int = 0, max_frames: int = 5000,
                    block: int = 1024) -> jnp.ndarray:
        """Blockwise streaming forward for long utterances.

        Re-implements Network::Feedforward (Nnet.cc:15-62): inputs over
        ``max_frames`` rows are processed in ``block``-frame chunks with
        ``start/end_frm_ext`` halo overlap so splicing stays exact; outputs
        are stitched with the halos trimmed.
        """
        T = x.shape[0]
        if T <= max_frames:
            return self.forward(x)
        out_chunks = []
        pos = 0
        while pos < T:
            end = min(pos + block, T)
            lo = max(pos - start_frm_ext, 0)
            hi = min(end + end_frm_ext, T)
            y = self.forward(x[lo:hi])
            out_chunks.append(y[pos - lo: y.shape[0] - (hi - end)])
            pos = end
        return jnp.concatenate(out_chunks, axis=0)
