"""FANN_FLO_2.1 text-format network loader.

The reference ships trained boilerplate nets (``data/boilerplate.*.net``)
and loads them through libfann's ``fann_create_from_file``
(trdeboilerplater.pas:697-699: ``SetFannFile``); classification parity
with an existing texrex deployment therefore requires reading the same
file format.  This is a from-scratch parser of the PUBLIC textual FANN
format (FLO_2.1, as written by libfann's ``fann_save``): a header line,
``key=value`` lines, one ``(num_inputs, activation, steepness)`` tuple
per neuron, and one ``(connected_to, weight)`` pair per connection.

Layout facts the parser relies on (standard LAYER nets,
``connection_rate=1``):

- ``layer_sizes`` INCLUDE one bias neuron per layer (the output layer's
  bias exists but has no outgoing connections);
- neurons are listed layer by layer, bias last in each layer, with
  ``num_inputs = previous layer size (incl. bias)`` for real neurons and
  0 for bias/input neurons;
- connections are concatenated in neuron order, each neuron's inputs
  ordered by source index.

Activations: FANN sigmoid is ``1/(1+exp(-2·s·x))`` and symmetric is
``tanh(s·x)``; the ``*_STEPWISE`` variants are libfann's piecewise-linear
approximations of the same curves — this loader computes the EXACT
curves (documented deviation; the approximation error is what disappears,
not a semantic difference).
"""

from __future__ import annotations

import re

import numpy as np

LINEAR = 0
SIGMOID = 3
SIGMOID_STEPWISE = 4
SIGMOID_SYMMETRIC = 5
SIGMOID_SYMMETRIC_STEPWISE = 6

_SUPPORTED = {LINEAR, SIGMOID, SIGMOID_STEPWISE, SIGMOID_SYMMETRIC,
              SIGMOID_SYMMETRIC_STEPWISE}

_TUPLE_RE = re.compile(r"\(([^)]*)\)")


class FannNet:
    """A parsed FLO_2.1 net: per-layer weight matrices + activations.

    ``weights[l]`` has shape (prev_size_incl_bias, n_real_neurons_l) so a
    forward pass is one matmul per layer with the bias folded in as the
    constant-1 last input.
    """

    def __init__(self, layer_sizes, weights, activations, steepnesses):
        self.layer_sizes = layer_sizes  # incl. bias, as in the file
        self.weights = weights
        self.activations = activations
        self.steepnesses = steepnesses

    @property
    def n_inputs(self) -> int:
        return self.layer_sizes[0] - 1

    @property
    def n_outputs(self) -> int:
        return self.weights[-1].shape[1]

    def run(self, x: np.ndarray) -> np.ndarray:
        """fann_run over a (rows, n_inputs) matrix → (rows, n_outputs)."""
        x = np.atleast_2d(np.asarray(x, dtype=np.float64))
        if x.shape[1] != self.n_inputs:
            raise ValueError(
                f"net expects {self.n_inputs} inputs, got {x.shape[1]}"
            )
        vals = x
        for w, act, steep in zip(self.weights, self.activations, self.steepnesses):
            with_bias = np.concatenate(
                [vals, np.ones((len(vals), 1))], axis=1
            )
            z = with_bias @ w
            if act == LINEAR:
                vals = steep * z
            elif act in (SIGMOID, SIGMOID_STEPWISE):
                vals = 1.0 / (1.0 + np.exp(-2.0 * steep * z))
            elif act in (SIGMOID_SYMMETRIC, SIGMOID_SYMMETRIC_STEPWISE):
                vals = np.tanh(steep * z)
            else:  # pragma: no cover - guarded at parse time
                raise ValueError(f"unsupported activation {act}")
        return vals


def parse_fann(text: str) -> FannNet:
    """Parse a FANN_FLO_2.1 text net (the format fann_save writes)."""
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines or not lines[0].startswith("FANN_FLO_2."):
        raise ValueError("not a FANN_FLO_2.x file")
    kv: dict[str, str] = {}
    neurons_raw = connections_raw = None
    for ln in lines[1:]:
        if ln.startswith("neurons "):
            neurons_raw = ln.split("=", 1)[1]
        elif ln.startswith("connections "):
            connections_raw = ln.split("=", 1)[1]
        elif "=" in ln:
            k, v = ln.split("=", 1)
            kv[k.strip()] = v.strip()
    if neurons_raw is None or connections_raw is None:
        raise ValueError("missing neurons/connections section")
    if int(kv.get("network_type", "0")) != 0:
        raise ValueError("only LAYER (network_type=0) nets are supported")
    if float(kv.get("connection_rate", "1")) != 1.0:
        raise ValueError("only fully-connected (connection_rate=1) nets")

    layer_sizes = [int(s) for s in kv["layer_sizes"].split()]
    n_layers = int(kv.get("num_layers", len(layer_sizes)))
    if n_layers != len(layer_sizes) or n_layers < 2:
        raise ValueError("inconsistent layer_sizes")

    neurons = []
    for tup in _TUPLE_RE.findall(neurons_raw):
        ni, act, steep = [p.strip() for p in tup.split(",")]
        neurons.append((int(ni), int(act), float(steep)))
    if len(neurons) != sum(layer_sizes):
        raise ValueError(
            f"expected {sum(layer_sizes)} neurons, found {len(neurons)}"
        )
    conns = []
    for tup in _TUPLE_RE.findall(connections_raw):
        src, w = [p.strip() for p in tup.split(",")]
        conns.append((int(src), float(w)))

    # reconstruct per-layer dense matrices
    weights, activations, steepnesses = [], [], []
    neuron_idx = layer_sizes[0]  # skip input layer (num_inputs = 0)
    first_prev = 0  # global index of the previous layer's first neuron
    ci = 0
    for li in range(1, n_layers):
        prev_size = layer_sizes[li - 1]
        size = layer_sizes[li]
        n_real = size - 1  # every layer carries one trailing bias neuron
        w = np.zeros((prev_size, n_real), dtype=np.float64)
        acts, steeps = set(), set()
        for j in range(n_real):
            ni, act, steep = neurons[neuron_idx + j]
            if ni != prev_size:
                raise ValueError(
                    f"neuron {neuron_idx + j}: num_inputs {ni} != {prev_size}"
                )
            if act not in _SUPPORTED:
                raise ValueError(f"unsupported activation {act}")
            acts.add(act)
            steeps.add(steep)
            for k in range(prev_size):
                src, wt = conns[ci]
                ci += 1
                if src != first_prev + k:
                    raise ValueError(
                        f"connection {ci - 1}: source {src}, expected "
                        f"{first_prev + k} (non-standard ordering)"
                    )
                w[k, j] = wt
        if len(acts) != 1 or len(steeps) != 1:
            raise ValueError("per-layer mixed activations are not supported")
        weights.append(w)
        activations.append(acts.pop())
        steepnesses.append(steeps.pop())
        neuron_idx += size
        first_prev += prev_size
    if ci != len(conns):
        raise ValueError(f"{len(conns) - ci} trailing connections unparsed")
    return FannNet(layer_sizes, weights, activations, steepnesses)


def load_fann(path: str) -> FannNet:
    with open(path) as f:
        return parse_fann(f.read())


def fann_to_mlp_weights(net: FannNet) -> dict:
    """Convert a 3-layer FANN net (symmetric hidden, sigmoid output) to
    the ``stages.boilerplate.MLP`` weight dict — EXACT: the MLP computes
    ``tanh(z)`` / ``1/(1+e^-z)``, so FANN's steepness folds into the
    weights (``tanh(s·Wx) = tanh((sW)x)``; sigmoid gains ``2s``).
    """
    if len(net.weights) != 2:
        raise ValueError("MLP conversion needs exactly one hidden layer")
    if net.activations[0] not in (SIGMOID_SYMMETRIC, SIGMOID_SYMMETRIC_STEPWISE):
        raise ValueError("hidden layer must be sigmoid-symmetric (tanh)")
    if net.activations[1] not in (SIGMOID, SIGMOID_STEPWISE):
        raise ValueError("output layer must be sigmoid")
    s1, s2 = net.steepnesses
    w1 = net.weights[0] * s1
    w2 = net.weights[1] * (2.0 * s2)
    return {
        "w1": w1[:-1].tolist(),
        "b1": w1[-1].tolist(),
        "w2": w2[:-1].tolist(),
        "b2": w2[-1].tolist(),
    }
