"""Model layer tests: MMF parsing, forward parity vs NumPy oracle."""

import io

import numpy as np
import pytest

import oracle
from nnet_asr_tpu.io.htk import FeatureReader
from nnet_asr_tpu.models import Network, components as C


def test_parse_transform(example01):
    net = Network.read(str(example01 / "lib" / "Hamm_dct_norm"))
    tags = [s.tag for s in net.specs]
    assert tags == ["<expand>", "<transpose>", "<window>",
                    "<blocklinearity>", "<bias>", "<window>"]
    net.check_dims()
    assert net.n_inputs == 23
    assert net.n_outputs == 598
    exp = net.specs[0]
    assert exp.offsets == tuple(range(-25, 26))


def test_transform_forward_matches_oracle(example01):
    net = Network.read(str(example01 / "lib" / "Hamm_dct_norm"))
    rd = FeatureReader(start_frm_ext=25, end_frm_ext=25)
    x = rd.read(str(example01 / "features" / "001.fea"))
    got = np.asarray(net.forward(x))
    want = oracle.forward_network(net, x)
    assert got.shape == (186, 598)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _mlp_text(rng, dims=(6, 8, 5)):
    """Generate an MLP MMF like tools/init/gen_mlp_init.py."""
    parts = []
    for i in range(len(dims) - 1):
        di, do = dims[i], dims[i + 1]
        w = 0.1 * rng.standard_normal((do, di))
        b = rng.random(do) / 5 - 4.1 if i < len(dims) - 2 else np.zeros(do)
        parts.append(f"<biasedlinearity> {do} {di}")
        parts.append(f"m {do} {di}")
        parts.extend(" ".join(repr(float(v)) for v in row) for row in w)
        parts.append(f"v {do}")
        parts.append(" ".join(repr(float(v)) for v in b))
        if i < len(dims) - 2:
            parts.append(f"<sigmoid> {do} {do}")
        else:
            parts.append(f"<softmax> {do} {do}")
    return "\n".join(parts) + "\n"


def test_parse_mlp_and_forward():
    rng = np.random.default_rng(0)
    text = _mlp_text(rng)
    net = Network.read(text)
    assert len(net.specs) == 4
    net.check_dims()
    x = rng.standard_normal((10, 6)).astype(np.float32)
    got = np.asarray(net.forward(x))
    want = oracle.forward_network(net, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_mmf_roundtrip():
    rng = np.random.default_rng(1)
    net = Network.read(_mlp_text(rng))
    text2 = net.to_text()
    net2 = Network.read(text2)
    assert [s.tag for s in net2.specs] == [s.tag for s in net.specs]
    for p1, p2 in zip(net.params, net2.params):
        for k in p1:
            np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]))


def test_transform_roundtrip(example01):
    net = Network.read(str(example01 / "lib" / "Hamm_dct_norm"))
    net2 = Network.read(net.to_text())
    x = np.random.default_rng(2).standard_normal((60, 23)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(net.forward(x)),
                               np.asarray(net2.forward(x)), rtol=1e-6)


def test_blocksoftmax():
    text = ("<biasedlinearity> 6 4\nm 6 4\n" +
            "\n".join(" ".join("0.1") * 0 or " ".join(["0.1"] * 4) for _ in range(6)) +
            "\nv 6\n0 0 0 0 0 0\n<blocksoftmax> 6 6\nv 2\n2 4\n")
    net = Network.read(text)
    x = np.random.default_rng(3).standard_normal((5, 4)).astype(np.float32)
    y = np.asarray(net.forward(x))
    np.testing.assert_allclose(y[:, :2].sum(axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(y[:, 2:].sum(axis=1), 1.0, rtol=1e-5)


def test_shared_linearity():
    # 2 instances: in 4 (2x2), out 6 (2x3)
    text = ("<sharedlinearity> 6 4\n2\nm 3 2\n1 0\n0 1\n1 1\nv 3\n0.5 0.5 0.5\n")
    net = Network.read(text)
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    y = np.asarray(net.forward(x))
    w = np.array([[1, 0, 1], [0, 1, 1]], dtype=np.float32)
    want = np.concatenate([x[:, :2] @ w + 0.5, x[:, 2:] @ w + 0.5], axis=1)
    np.testing.assert_allclose(y, want, rtol=1e-6)


def test_discrete_linearity():
    text = ("<discretelinearity> 4 4\n2\nm 2 2\n1 0\n0 1\nm 2 2\n2 0\n0 2\n"
            "v 4\n1 1 1 1\n")
    net = Network.read(text)
    x = np.ones((3, 4), dtype=np.float32)
    y = np.asarray(net.forward(x))
    want = np.concatenate([x[:, :2] @ np.eye(2), x[:, 2:] @ (2 * np.eye(2))],
                          axis=1) + 1
    np.testing.assert_allclose(y, want.astype(np.float32))


def test_rbm_layer_forward():
    text = ("<rbm> 3 2\nbern bern\nm 3 2\n0.1 0.2\n0.3 0.4\n0.5 0.6\n"
            "v 2\n0 0\nv 3\n0.1 0.2 0.3\n")
    net = Network.read(text)
    spec = net.specs[0]
    assert isinstance(spec, C.Rbm)
    x = np.random.default_rng(5).standard_normal((4, 2)).astype(np.float32)
    y = np.asarray(net.forward(x))
    w = np.array([[0.1, 0.3, 0.5], [0.2, 0.4, 0.6]], dtype=np.float32)
    want = oracle.sigmoid(x @ w + np.array([0.1, 0.2, 0.3], dtype=np.float32))
    np.testing.assert_allclose(y, want, rtol=1e-5)
    # roundtrip
    net2 = Network.read(net.to_text())
    np.testing.assert_allclose(np.asarray(net2.forward(x)), y, rtol=1e-6)


def test_recurrent_layer():
    rng = np.random.default_rng(6)
    w = 0.3 * rng.standard_normal((5, 3)).astype(np.float32)  # (in+out, out)
    b = 0.1 * rng.standard_normal(3).astype(np.float32)
    rows = "\n".join(" ".join(repr(float(v)) for v in row) for row in w.T)
    text = f"<recurrent> 3 2\nm 3 5\n{rows}\nv 3\n" + \
        " ".join(repr(float(v)) for v in b) + "\n"
    net = Network.read(text)
    x = rng.standard_normal((7, 2)).astype(np.float32)
    y = np.asarray(net.forward(x))
    # oracle: frame-serial loop
    h = np.zeros(3, dtype=np.float32)
    for t in range(7):
        h = oracle.sigmoid(np.concatenate([x[t], h]) @ w + b)
        np.testing.assert_allclose(y[t], h, rtol=1e-4, atol=1e-5)


def test_blockarray():
    text = ("<blockarray> 4 4\n2\n"
            "<block> 1\n<biasedlinearity> 2 2\nm 2 2\n1 0\n0 1\nv 2\n0 0\n<endblock>\n"
            "<block> 2\n<biasedlinearity> 2 2\nm 2 2\n2 0\n0 2\nv 2\n1 1\n<endblock>\n")
    net = Network.read(text)
    x = np.ones((2, 4), dtype=np.float32)
    y = np.asarray(net.forward(x))
    want = np.concatenate([x[:, :2], 2 * x[:, 2:] + 1], axis=1)
    np.testing.assert_allclose(y, want)


def test_feedforward_blockwise_matches_full(example01):
    net = Network.read(str(example01 / "lib" / "Hamm_dct_norm"))
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2500, 23)).astype(np.float32)
    full = np.asarray(net.forward(x))
    blocked = np.asarray(net.feedforward(
        x, start_frm_ext=25, end_frm_ext=25, max_frames=1000, block=512))
    np.testing.assert_allclose(blocked, full, rtol=1e-5, atol=1e-5)


def test_mmf_fuzz_roundtrip():
    """Random component stacks round-trip through the MMF text format."""
    import io as _io
    rng = np.random.default_rng(42)
    from nnet_asr_tpu.models import components as C
    from nnet_asr_tpu.models.network import write_component

    for trial in range(10):
        dims = [int(rng.integers(2, 12)) for _ in range(4)]
        specs_params = []
        d = dims[0]
        for nxt in dims[1:]:
            kind = rng.integers(0, 5)
            if kind == 0:
                specs_params.append((C.BiasedLinearity(d, nxt), {
                    "weight": rng.standard_normal((d, nxt)).astype(np.float32),
                    "bias": rng.standard_normal(nxt).astype(np.float32)}))
                d = nxt
            elif kind == 1:
                specs_params.append((C.Bias(d, d), {
                    "bias": rng.standard_normal(d).astype(np.float32)}))
            elif kind == 2:
                specs_params.append((C.Window(d, d), {
                    "window": rng.standard_normal(d).astype(np.float32)}))
            elif kind == 3:
                specs_params.append((C.Sigmoid(d, d), {}))
            else:
                k = int(rng.integers(1, 4))
                offs = tuple(range(-k, k + 1))
                specs_params.append((C.Expand(d, d * len(offs), offsets=offs), {}))
                d = d * len(offs)
        buf = _io.StringIO()
        for spec, p in specs_params:
            write_component(buf, spec, p)
        net = Network.read(buf.getvalue())
        net.check_dims()
        x = rng.standard_normal((7, dims[0])).astype(np.float32)
        y1 = np.asarray(net.forward(x))
        net2 = Network.read(net.to_text())
        y2 = np.asarray(net2.forward(x))
        np.testing.assert_array_equal(y1, y2)
