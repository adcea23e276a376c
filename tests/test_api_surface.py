"""The reference's public import surface resolves here.

Every public name of GRAFX v0.6.0 (enumerated from its source; see
docs/migration.md) must exist at the same relative import path with
``grafx`` -> ``grafx_tpu``, except the documented renames.

reference: src/grafx/**/__init__.py and module-level defs.
"""

import importlib

import pytest

SURFACE = {
    "grafx_tpu.data": [
        "GRAFX", "GRAFXTensor", "NodeConfigs", "batch_grafx",
        "convert_to_tensor",
    ],
    "grafx_tpu.utils": [
        "count_nodes_per_type", "create_empty_parameters",
        "create_empty_parameters_from_shape_dict", "get_node_ids_from_type",
        "permute_grafx_tensor",
    ],
    "grafx_tpu.render": [
        "RenderData", "aggregate_tensor", "check_aggregate_method",
        "check_and_convert_arange", "create_per_type_indices",
        "create_signal_buffer", "expand_tensor_or_tensor_dict",
        "flatten_batch_and_node", "prepare_render", "read_tensor",
        "read_tensor_or_tensor_dict", "render_grafx", "write_tensor",
    ],
    "grafx_tpu.render.order": [
        "beam_search", "compute_render_order", "compute_render_order_tensor",
        "fixed_order_search", "greedy_search", "node_id_from_render_order",
        "one_by_one_search", "reorder_for_fast_render",
        "return_render_ordered_graph", "return_render_ordered_tensor",
    ],
    "grafx_tpu.processors": [
        "AllPassFilter", "ApproxCompressor", "ApproxNoiseGate",
        "BallisticsEnvelopeFollower", "BandPassFilter", "BandRejectFilter",
        "BaseEnvelopeFollower", "BaseParametricEqualizerFilter",
        "BaseParametricFilter", "BiquadFilter", "ChebyshevDistortion",
        "Compressor", "DryWet", "FIRFilter", "FactorizedCompressor",
        "FilteredNoiseShapingReverb", "GainStagingRegularization",
        "GraphicEqualizer", "HighPassFilter", "HighShelf",
        "IIREnvelopeFollower", "LowPassFilter", "LowShelf",
        "MidSideToStereo", "MonoToStereo", "MultitapDelay",
        "NewZeroPhaseFIREqualizer", "NoiseGate", "ParallelMix",
        "ParametricEqualizer", "PeakingFilter", "PiecewiseTanhDistortion",
        "PoleZeroFilter", "PowerDistortion", "STFTMaskedNoiseReverb",
        "SerialChain", "SideGainImager", "StateVariableFilter", "StereoGain",
        "StereoToMidSide", "TanhDistortion", "ZeroPhaseFIREqualizer",
    ],
    "grafx_tpu.processors.core": [
        "Ballistics", "FIRConvolution", "GraphicEqualizerBiquad", "IIRFilter",
        "SurrogateDelay", "TriangularFilterBank", "TruncatedOnePoleIIRFilter",
        "ZeroPhaseFIR", "ZeroPhaseFilterBankFIR", "apply_linkwitz_riley",
        "bark_to_hz", "compute_pad_len", "convolve", "from_scale",
        "get_filtered_noise", "get_window", "hz_to_bark", "hz_to_log",
        "hz_to_mel", "log_magnitude_to_zerophase_fir", "log_to_hz",
        "lr_to_ms", "mel_to_hz", "ms_to_lr", "normalize_impulse",
        "normalized_gradient", "octave_band_filterbank", "rms_difference",
        "to_scale",
    ],
    "grafx_tpu.draw": [
        "NodeColorHandler", "add_edge_curve", "compute_node_position",
        "compute_rank", "cubic_bezier", "draw_edge", "draw_grafx",
        "draw_node", "estimate_chain", "postprocess_figure",
    ],
}


@pytest.mark.parametrize("module", sorted(SURFACE))
def test_surface_resolves(module):
    m = importlib.import_module(module)
    missing = [n for n in SURFACE[module] if not hasattr(m, n)]
    assert not missing, f"{module} lacks {missing}"
