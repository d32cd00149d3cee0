"""FANN_FLO_2.1 loader golden tests (ref: trdeboilerplater.pas:619-699
loads reference-shipped nets via fann_create_from_file; the parser reads
libfann's public text format so those nets are usable here)."""

import json
import subprocess
import sys

import numpy as np

# a hand-written 2-2-1 net: layer_sizes include one bias per layer
GOLDEN = """FANN_FLO_2.1
num_layers=3
learning_rate=0.700000
connection_rate=1.000000
network_type=0
layer_sizes=3 3 2
scale_included=0
neurons (num_inputs, activation_function, activation_steepness)=(0, 0, 0.0) (0, 0, 0.0) (0, 0, 0.0) (3, 5, 5.00000000000000000000e-01) (3, 5, 5.00000000000000000000e-01) (0, 5, 0.0) (3, 3, 5.00000000000000000000e-01) (0, 3, 0.0)
connections (connected_to_neuron, weight)=(0, 2.50000000000000000000e-01) (1, -5.00000000000000000000e-01) (2, 1.00000000000000005551e-01) (0, 7.50000000000000000000e-01) (1, 2.00000000000000011102e-01) (2, -3.00000000000000044409e-01) (3, 1.50000000000000000000e+00) (4, -1.25000000000000000000e+00) (5, 4.00000000000000022204e-01)
"""


def _expect(x1, x2):
    """Independent hand computation of fann_run on GOLDEN."""
    h1 = np.tanh(0.5 * (0.25 * x1 - 0.5 * x2 + 0.1))
    h2 = np.tanh(0.5 * (0.75 * x1 + 0.2 * x2 - 0.3))
    z = 1.5 * h1 - 1.25 * h2 + 0.4
    return 1.0 / (1.0 + np.exp(-2.0 * 0.5 * z))


def test_parse_golden_and_run():
    from texrex_ray.stages.fann import parse_fann

    net = parse_fann(GOLDEN)
    assert net.layer_sizes == [3, 3, 2]
    assert net.n_inputs == 2 and net.n_outputs == 1
    x = np.array([[0.0, 0.0], [1.0, -1.0], [0.3, 0.7], [-2.0, 5.0]])
    got = net.run(x)[:, 0]
    want = np.array([_expect(a, b) for a, b in x])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-15)


def test_mlp_conversion_is_exact():
    from texrex_ray.stages.boilerplate import MLP
    from texrex_ray.stages.fann import fann_to_mlp_weights, parse_fann

    net = parse_fann(GOLDEN)
    mlp = MLP(fann_to_mlp_weights(net))
    x = np.array([[0.1, 0.2], [3.0, -4.0]])
    np.testing.assert_allclose(mlp.score(x), net.run(x)[:, 0], atol=1e-15)


def test_deboilerplater_accepts_fann_file(tmp_path):
    from texrex_ray.stages.boilerplate import Deboilerplater

    # a 37-input net shaped like the reference's boilerplate nets
    rng = np.random.default_rng(5)
    n_in, n_hid = 37, 4
    sizes = f"{n_in + 1} {n_hid + 1} 2"
    neurons = (
        " ".join(["(0, 0, 0.0)"] * (n_in + 1))
        + " "
        + " ".join([f"({n_in + 1}, 5, 0.5)"] * n_hid)
        + " (0, 5, 0.0) "
        + f"({n_hid + 1}, 3, 0.5) (0, 3, 0.0)"
    )
    conns = []
    src = 0
    for _ in range(n_hid):
        conns += [f"({src + k}, {rng.normal():.6e})" for k in range(n_in + 1)]
    for k in range(n_hid + 1):
        conns.append(f"({n_in + 1 + k}, {rng.normal():.6e})")
    text = (
        "FANN_FLO_2.1\nnum_layers=3\nconnection_rate=1.000000\n"
        f"network_type=0\nlayer_sizes={sizes}\n"
        f"neurons (num_inputs, activation_function, activation_steepness)={neurons}\n"
        f"connections (connected_to_neuron, weight)={' '.join(conns)}\n"
    )
    p = tmp_path / "boilerplate.net"
    p.write_text(text)
    d = Deboilerplater(fann_file=str(p))
    assert d.net.w1.shape == (n_in, n_hid)
    assert np.isfinite(d.net.score(np.zeros((3, n_in)))).all()


def test_fannport_cli(tmp_path):
    p = tmp_path / "g.net"
    p.write_text(GOLDEN)
    out = tmp_path / "w.json"
    r = subprocess.run(
        [sys.executable, "-m", "texrex_ray", "fannport", str(p), str(out)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    w = json.loads(out.read_text())
    assert len(w["w1"]) == 2 and len(w["w2"]) == 2


def test_parser_rejects_malformed():
    import pytest

    from texrex_ray.stages.fann import parse_fann

    with pytest.raises(ValueError):
        parse_fann("NOT_FANN\n")
    with pytest.raises(ValueError):
        parse_fann(GOLDEN.replace("network_type=0", "network_type=1"))
    # truncated connections must fail loudly, not mis-wire
    trunc = GOLDEN.rsplit(" (5, ", 1)[0]
    with pytest.raises((ValueError, IndexError)):
        parse_fann(trunc)
