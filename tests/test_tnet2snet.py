"""tnet2snet converter tests: structural parity with the reference
converter's layer mapping (tools/tnet2snet/tnet2snet.py)."""

import io

import numpy as np

from nnet_asr_tpu.models import Network
from nnet_asr_tpu.tools.tnet2snet import convert, main, write_snet


TRANSFORM_MMF = """<expand> 6 2
v 3 -1 0 1
<transpose> 6 6
 3
<window> 6 6
v 6 1 2 3 4 5 6
<bias> 6 6
v 6 0.5 0.5 0.5 0.5 0.5 0.5
<log> 6 6
"""

MLP_MMF = """<biasedlinearity> 3 6
m 3 6
1 2 3 4 5 6
7 8 9 10 11 12
13 14 15 16 17 18
v 3 0.1 0.2 0.3
<sigmoid> 3 3
<biasedlinearity> 2 3
m 2 3
1 0 0
0 1 0
v 2 0 0
<softmax> 2 2
"""


def _net(text):
    return Network.read(io.StringIO(text))


def test_convert_mlp_layer_mapping():
    layers = convert([_net(MLP_MMF)])
    headers = [h for h, _ in layers]
    assert headers == ["<Xform> 3 6", "<Bias> 3", "<Sigmoid> 3",
                       "<Xform> 2 3", "<Bias> 2", "<Softmax> 2"]
    # weights emit in the stored transposed (out, in) orientation
    np.testing.assert_array_equal(
        np.asarray(layers[0][1].split()[:6], np.float32),
        np.arange(1, 7, dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(layers[1][1].split(), np.float32),
        np.asarray([0.1, 0.2, 0.3], np.float32))


def test_convert_transform_layers():
    layers = convert([_net(TRANSFORM_MMF)])
    headers = [h for h, _ in layers]
    # <expand> becomes <Stacking> + <Copy> with 1-based ranges
    assert headers[0] == "<Stacking> 3 2"
    assert headers[1] == "<Copy> 6 6"
    assert layers[1][1].split() == ["1:2", "3:4", "5:6"]
    assert headers[2] == "<Transpose> 3 2"
    assert headers[3] == "<Window> 6"
    assert layers[3][1].split() == ["1", "2", "3", "4", "5", "6"]
    assert headers[4] == "<Bias> 6"
    assert headers[5] == "<Log> 6"


def test_convert_concatenates_and_trims_bndim():
    # transform + MLP chained like the reference's multi-infile mode;
    # --bndim=3 stops after the first layer with 3 outputs
    layers = convert([_net(TRANSFORM_MMF), _net(MLP_MMF)], bndim=3)
    headers = [h for h, _ in layers]
    assert headers[-1] == "<Bias> 3"          # trimmed right after 6->3 affine
    assert "<Sigmoid> 3" not in headers


def test_write_snet_format():
    buf = io.StringIO()
    write_snet(convert([_net(MLP_MMF)]), buf)
    text = buf.getvalue()
    assert text.startswith('~x "NNetsFwdComplete"\n<NumLayers> 6\n<Layer> 1\n')
    assert "<Layer> 6\n<Softmax> 2\n" in text


def test_main_cli(tmp_path, capsys):
    src = tmp_path / "net.mmf"
    src.write_text(MLP_MMF)
    out = tmp_path / "net.snet"
    assert main(["tnet2snet", str(src), str(out)]) == 0
    assert out.read_text().startswith('~x "NNetsFwdComplete"')
    # stdout mode
    assert main(["tnet2snet", str(src), "-"]) == 0
    assert '~x "NNetsFwdComplete"' in capsys.readouterr().out


def test_blocksoftmax_and_shared():
    mmf = """<sharedlinearity> 4 4
2
m 2 2
1 2
3 4
v 2 0 0
<blocksoftmax> 4 4
v 2 2 2
"""
    layers = convert([_net(mmf)])
    assert layers[0][0] == "<NumBlocks> 2"
    assert "<NumLayers> 2" in layers[0][1]
    assert "<XForm> 2 2" in layers[0][1]
    assert layers[1][0] == "<NumBlocks> 2"
    assert layers[1][1].count("<Softmax> 2") == 2
