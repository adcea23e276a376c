"""Graph factories for common audio-console topologies.

Each factory returns ``(G, processors)`` ready for
``reorder_for_fast_render`` -> ``prepare_render`` ->
``create_empty_parameters`` -> ``make_render_fn``.
"""

from grafx_tpu.data import GRAFX, NodeConfigs
from grafx_tpu.processors import (
    Compressor,
    GraphicEqualizer,
    MultitapDelay,
    NoiseGate,
    ParametricEqualizer,
    STFTMaskedNoiseReverb,
    StereoGain,
    TanhDistortion,
)


def simple_chain(
    chain=("eq", "compressor", "gain"),
    backend="exact",
    ir_len=30000,
):
    """One source through a serial chain: the reference's minimal demo."""
    processors = _default_processors(backend=backend, ir_len=ir_len)
    config = NodeConfigs(sorted(processors))
    G = GRAFX(config=config)
    G.add_serial_chain(["in", *chain, "out"])
    used = {t for t in chain}
    return G, {k: v for k, v in processors.items() if k in used}


def mixing_console(
    num_tracks=8,
    track_chain=("eq", "compressor", "gain"),
    bus_chain=("geq", "compressor"),
    reverb_send=True,
    backend="exact",
    ir_len=30000,
):
    """A music-mixing console: per-track chains summed into a processed
    bus, with an optional shared reverb send (the paper's ~100-node
    benchmark topology at ``num_tracks~=16``)."""
    processors = _default_processors(backend=backend, ir_len=ir_len)
    config = NodeConfigs(sorted(processors))
    G = GRAFX(config=config)

    ends = []
    for _ in range(num_tracks):
        _, last = G.add_serial_chain(["in", *track_chain])
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)

    first, bus_end = G.add_serial_chain(list(bus_chain))
    G.connect(mix, first)

    master = G.add("mix")
    G.connect(bus_end, master)
    if reverb_send:
        rev = G.add("reverb")
        G.connect(bus_end, rev)
        G.connect(rev, master)
    out = G.add("out")
    G.connect(master, out)

    used = set(track_chain) | set(bus_chain) | ({"reverb"} if reverb_send else set())
    return G, {k: v for k, v in processors.items() if k in used}


def mastering_chain(backend="exact"):
    """A stereo mastering chain: EQ -> multiband-ish GEQ -> compressor ->
    saturation -> gain."""
    processors = _default_processors(backend=backend)
    config = NodeConfigs(sorted(processors))
    G = GRAFX(config=config)
    chain = ["in", "eq", "geq", "compressor", "dist", "gain", "out"]
    G.add_serial_chain(chain)
    used = set(chain) - {"in", "out"}
    return G, {k: v for k, v in processors.items() if k in used}


def _default_processors(backend="exact", ir_len=30000):
    return {
        "eq": ParametricEqualizer(num_filters=6, backend=backend),
        "geq": GraphicEqualizer(scale="bark", backend=backend),
        "compressor": Compressor(energy_smoother="ballistics"),
        "noisegate": NoiseGate(energy_smoother="iir"),
        "gain": StereoGain(),
        "dist": TanhDistortion(),
        "reverb": STFTMaskedNoiseReverb(ir_len=ir_len),
        "delay": MultitapDelay(segment_len=1500, num_segments=10),
    }
