"""GRAFX-style PyTorch CPU proxy for the headline benchmark.

The reference cannot run in this image (torchaudio / torch_geometric /
torchlpc / torchcomp are not installed), so this file re-implements its
*execution model and default algorithms* in plain torch as a same-machine
baseline for `bench.py`'s 84-node graph:

- per-stage Python render loop over the same type-batched schedule
  (computed by grafx_tpu's scheduler — the plan layer is shared),
- frequency-sampling (FSM) biquad approximation for EQ / GEQ (the
  reference's default backend, 4000-tap FIR),
- truncated one-pole FIR smoothing for compressor / noisegate (the
  reference's "iir" mode; its ballistics mode needs torchcomp),
- STFT masked-noise reverb via torch.stft/istft,
- FFT convolutions via torch.fft.

Written from the published math, not the reference source.  Run:

    python benchmarks/torch_proxy.py
"""

import json
import math
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, ".")

import bench as B
from grafx_tpu.data import convert_to_tensor
from grafx_tpu.render import prepare_render, reorder_for_fast_render

SR = 44100
FSM_LEN = 4000
IIR_LEN = 16384


def next_pow2(n):
    return 1 << (int(n) - 1).bit_length()


def fft_conv_causal(x, h):
    n = next_pow2(x.shape[-1] + h.shape[-1] - 1)
    X = torch.fft.rfft(x, n=n)
    H = torch.fft.rfft(h, n=n)
    y = torch.fft.irfft(X * H, n=n)
    return y[..., : x.shape[-1]]


def fsm_fir(Bs, As, fir_len=FSM_LEN):
    """FIR approximation of a biquad cascade by frequency sampling."""
    k = torch.arange(3, dtype=torch.float32)[:, None]
    bins = torch.arange(fir_len // 2 + 1, dtype=torch.float32)[None, :]
    delays = torch.exp(-1j * 2 * math.pi * k * bins / fir_len)  # (3, F)
    num = (Bs.unsqueeze(-1) * delays).sum(-2)
    den = (As.unsqueeze(-1) * delays).sum(-2)
    resp = (num / den).prod(-2)  # (..., F)
    return torch.fft.irfft(resp, n=fir_len)


def peq_coeffs(w0, q_inv, log_gain):
    """Cookbook low-shelf + peaks + high-shelf cascade coefficients."""
    w0 = math.pi * torch.sigmoid(w0)
    alpha = torch.sin(w0) * torch.exp(q_inv) * 0.5
    A = torch.exp(log_gain)
    cos_w0 = torch.cos(w0)

    def peaking(c, al, A):
        b = torch.stack([1 + al * A, -2 * c, 1 - al * A], -1)
        a = torch.stack([1 + al / A, -2 * c, 1 - al / A], -1)
        return b, a

    def shelf(c, al, A, low):
        Ap, Am = A + 1, A - 1
        s = 2 * torch.sqrt(A) * al
        sign = 1.0 if low else -1.0
        b0 = A * (Ap - sign * Am * c + s)
        b1 = sign * 2 * A * (Am - sign * Ap * c)
        b2 = A * (Ap - sign * Am * c - s)
        a0 = Ap + sign * Am * c + s
        a1 = -sign * 2 * (Am + sign * Ap * c)
        a2 = Ap + sign * Am * c - s
        return torch.stack([b0, b1, b2], -1), torch.stack([a0, a1, a2], -1)

    bl, al_ = shelf(cos_w0[..., :1], alpha[..., :1], A[..., :1], True)
    bp, ap = peaking(cos_w0[..., 1:-1], alpha[..., 1:-1], A[..., 1:-1])
    bh, ah = shelf(cos_w0[..., -1:], alpha[..., -1:], A[..., -1:], False)
    Bs = torch.cat([bl, bp, bh], -2)
    As = torch.cat([al_, ap, ah], -2)
    return Bs, As


def geq_coeffs(log_gains, fc, fB, sr=SR):
    wc = 2 * math.pi * fc / sr
    m2cos = -2 * torch.cos(wc)
    tanB = torch.tan(math.pi * fB / sr)
    g = torch.exp(log_gains)
    g2 = g * g
    ng2 = torch.exp(2 * 0.4 * log_gains)
    mult = torch.sqrt(((1 - ng2).abs() + 1e-7) / ((g2 - ng2).abs() + 1e-7))
    beta = tanB * torch.where(log_gains.abs() >= 1e-3, mult, torch.ones_like(mult))
    gb = g * beta
    m2 = m2cos.expand_as(g)
    Bs = torch.stack([1 + gb, m2, 1 - gb], -1)
    As = torch.stack([1 + beta, m2, 1 - beta], -1)
    return Bs, As


class TorchProxy:
    def __init__(self):
        G = B.build_mix_graph()
        G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
        self.plan = prepare_render(G_t)
        self.G = G

        # fixed reverb noise STFT (reference-style seed-0 noise)
        rng = np.random.RandomState(0)
        ir_len = 30000
        noise = torch.tensor(
            2 * rng.uniform(size=(2, ir_len)) - 1, dtype=torch.float32
        )
        self.n_fft, self.hop = 384, 192
        self.window = torch.hann_window(self.n_fft)
        self.noise_stft = torch.stft(
            noise, self.n_fft, self.hop, window=self.window, return_complex=True
        )[None]
        self.ir_len = ir_len
        self.num_frames = self.noise_stft.shape[-1]
        self.num_bins = self.n_fft // 2 + 1

        from grafx_tpu.processors.core.geq import FB_BARK, FC_BARK

        self.fc = torch.tensor(FC_BARK, dtype=torch.float32)
        self.fB = torch.tensor(FB_BARK, dtype=torch.float32)

        one_pole_n = torch.arange(IIR_LEN, dtype=torch.float32)
        self.one_pole_n = one_pole_n

        self.param_shapes = {
            "eq": {"w0": (1, 6), "q_inv": (1, 6), "log_gain": (1, 6)},
            "geq": {"log_gains": (1, 24)},
            "compressor": {
                "log_threshold": (1,),
                "log_ratio": (1,),
                "log_knee": (1,),
                "z_alpha_pre": (1,),
            },
            "noisegate": {
                "log_threshold": (1,),
                "log_ratio": (1,),
                "log_knee": (1,),
                "z_alpha_pre": (1,),
            },
            "gain": {"log_gain": (2,)},
            "dist": {"log_pre_gain": (1,)},
            "reverb": {
                "init_log_magnitude": (2, self.num_bins),
                "delta_log_magnitude": (2, self.num_bins),
            },
        }

    def init_params(self):
        from grafx_tpu.utils import count_nodes_per_type

        counts = count_nodes_per_type(self.G, list(self.param_shapes))
        torch.manual_seed(0)
        params = {}
        for t, shapes in self.param_shapes.items():
            params[t] = {
                k: (1e-2 * torch.randn(counts[t], *shape)).requires_grad_(True)
                for k, shape in shapes.items()
            }
        return params

    # -- processors (reference-default algorithms) ---------------------------

    def proc_eq(self, x, p):
        Bs, As = peq_coeffs(p["w0"], p["q_inv"], p["log_gain"])
        fir = fsm_fir(Bs, As)  # (N, 1, FSM_LEN)
        return fft_conv_causal(x, fir)

    def proc_geq(self, x, p):
        Bs, As = geq_coeffs(p["log_gains"], self.fc, self.fB)
        fir = fsm_fir(Bs, As)
        return fft_conv_causal(x, fir)

    def _smooth_energy(self, e, z_alpha):
        alpha = torch.sigmoid(z_alpha).clamp(max=1 - 1e-5)
        h = (1 - alpha) * torch.exp(
            self.one_pole_n * torch.log(alpha)
        )  # (N, IIR_LEN)
        return F.relu(fft_conv_causal(e, h))

    def _dyn(self, x, p, gate):
        e = x.square().mean(-2)
        e = self._smooth_energy(e, p["z_alpha_pre"])
        le = torch.log(e + 1e-5)
        T = p["log_threshold"] - 6.0
        R = 1 + torch.exp(p["log_ratio"])
        W = torch.exp(p["log_knee"]) / 2
        if gate:
            below = R * (le - T) + T
            above = le
            mid = le + (1 - R) * (le - T - W).square() / (4 * W)
        else:
            below = le
            above = T + (le - T) / R
            mid = le + (1 / R - 1) * (le - T + W).square() / (4 * W)
        out = torch.where(le < T - W, below, torch.where(le > T + W, above, mid))
        return torch.exp(out - le).unsqueeze(-2) * x

    def proc_compressor(self, x, p):
        return self._dyn(x, p, gate=False)

    def proc_noisegate(self, x, p):
        return self._dyn(x, p, gate=True)

    def proc_gain(self, x, p):
        return x * torch.exp(p["log_gain"]).unsqueeze(-1)

    def proc_dist(self, x, p):
        g = torch.exp(p["log_pre_gain"]).unsqueeze(-1)
        return torch.tanh(x * g) / g

    def proc_reverb(self, x, p):
        arange = torch.arange(self.num_frames, dtype=torch.float32)
        mask = torch.exp(
            (
                p["init_log_magnitude"][..., None]
                - F.softplus(p["delta_log_magnitude"])[..., None] * arange
            )
            / 8
        )
        ir_stft = (self.noise_stft * mask).reshape(
            -1, self.num_bins, self.num_frames
        )
        ir = torch.istft(
            ir_stft, self.n_fft, self.hop, window=self.window, length=self.ir_len
        ).reshape(-1, 2, self.ir_len)
        # pseudo mid/side -> L/R
        mid, side = ir[:, :1], ir[:, 1:]
        ir = torch.cat([mid + side, mid - side], 1)
        ir = ir / torch.sqrt(
            ir.square().sum(-1, keepdim=True).mean(-2, keepdim=True) + 1e-12
        )
        return fft_conv_causal(x, ir)

    # -- render loop ----------------------------------------------------------

    def render(self, x, params):
        plan = self.plan
        buf = torch.zeros(plan.num_buffers, 2, x.shape[-1])
        buf[: x.shape[0]] = x
        out = None
        for i in range(1, plan.max_order + 1):
            st = plan.iter_list[i]
            read = st.source_reads[0]
            if read.method == "slice":
                sig = buf[read.idx[0] : read.idx[1]]
            else:
                sig = buf[torch.tensor(read.idx)]
            agg = st.aggregations[0]
            if agg.method == "sum":
                sig = sig.sum(0, keepdim=True)
            elif agg.method == "scatter":
                tgt = torch.zeros(agg.num_segments, *sig.shape[1:])
                tgt = tgt.index_add(0, torch.tensor(agg.idx), sig)
                sig = tgt
            t = st.node_type
            if t in ("in", "out", "mix"):
                y = sig
            else:
                pr = st.parameter_read
                if pr.method == "slice":
                    p = {k: v[pr.idx[0] : pr.idx[1]] for k, v in params[t].items()}
                else:
                    idx = torch.tensor(pr.idx)
                    p = {k: v[idx] for k, v in params[t].items()}
                y = getattr(self, f"proc_{t}")(sig, p)
            dw = st.dest_write
            buf = buf.clone()
            if dw.method == "slice":
                buf[dw.idx[0] : dw.idx[1]] = y
            else:
                buf[torch.tensor(dw.idx)] = y
            out = y
        return out


def main():
    proxy = TorchProxy()
    params = proxy.init_params()
    x = torch.randn(B.NUM_CHAINS, 2, B.AUDIO_LEN)
    target = torch.randn(1, 2, B.AUDIO_LEN)

    def step():
        out = proxy.render(x, params)
        loss = (out - target).square().mean()
        loss.backward()
        with torch.no_grad():
            for t in params.values():
                for v in t.values():
                    if v.grad is not None:
                        v -= 1e-3 * v.grad
                        v.grad = None
        return loss

    step()  # warmup
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        step()
    dt = (time.time() - t0) / iters
    audio_sec = B.NUM_CHAINS * B.AUDIO_LEN / SR
    print(
        json.dumps(
            {
                "metric": f"torch-CPU GRAFX-style proxy, same {proxy.G.number_of_nodes()}-node graph,"
                f" fwd+bwd grad step {dt * 1000:.0f} ms",
                "value": round(audio_sec / dt, 2),
                "unit": "audio-sec/sec",
            }
        )
    )


if __name__ == "__main__":
    main()
