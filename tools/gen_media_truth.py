"""Independent derivation of the three real-codec multimodal goldens.

Through r7 the PPM/WAV/Y4M expected outputs were GOLDEN pins: dumped from
one verified run of the engine itself (tools/gen_bam_golden.py), so the
driver hash could detect regressions but the values were self-referential.
This tool re-derives all three expected tables from the media SYNTHESIS
parameters alone — the gradient/sine/luma formulas that define each
payload — without importing operators/multimodal.py and without ever
constructing or parsing the encoded container bytes.  The engine path is
encode (PPM/RIFF/Y4M container bytes) → distributed decode (header walk,
chunk walk, frame split) → feature math; this derivation computes the
features straight from the pattern parameters, so a bug anywhere in the
encode→decode round trip (header parsing, raster offsets, chunk
alignment, plane geometry) shows up as a value mismatch.

Synthesis spec (the contract, mirrored from the operator docstrings):

- PPM image, 32x24, seed s = media_id: r=(x*7+s)%256, g=(y*13+3s)%256,
  b=(x+y+5s)%256.  Features = luma (BT.601 / 255, float32) resampled
  nearest-neighbor to 16x16, column means, float32.
- WAV clip, 2048 int16 mono samples at 8 kHz, seed s:
  sin(2*pi*f*t/8000 + s%7) with f = 110 + (s%32)*55, scaled by 32000.
  Features = RMS over 16 equal windows of samples/32768 (float32).
- Y4M clip, 16x12, 12 frames, seed s: frame f luma = (x*3+y*5+f*17+s)%256;
  sampler keeps every 4th frame (0, 4, 8) and averages the mean lumas.

The registered queries reduce features to feature_sum/f0 (PPM),
energy_sum/rms0 (WAV) and n_frames_kept/max_idx/avg_luma (Y4M); the
reductions here replicate Spark's evaluation order exactly: left-fold
double accumulation for aggregate(), input-order partial sums for avg(),
and HALF_UP decimal rounding for round() (BigDecimal semantics, not
Python's banker's rounding).

Modes:
    python tools/gen_media_truth.py            # --check (default): compare
                                               # committed goldens, exit 1
                                               # on any field mismatch
    python tools/gen_media_truth.py --write    # (re)write the goldens

The id range mirrors the committed goldens: every doc_id in
/root/testdata/sf0.1/documents.parquet (the superset range the oracles
semi-join against).
"""

from __future__ import annotations

import argparse
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures")
GOLDEN_SF_DIR = "/root/testdata/sf0.1"

PPM_W, PPM_H = 32, 24
WAV_N, WAV_SR = 2048, 8000
Y4M_W, Y4M_H, Y4M_FRAMES, Y4M_STRIDE = 16, 12, 12, 4
DIM = 16


def _round6(v: float) -> float:
    """Spark's round(double, 6): BigDecimal.valueOf(d).setScale(6,
    HALF_UP) — decimal digits of the shortest round-trip repr, ties away
    from zero (Python's round() is banker's and would differ on ties)."""
    return float(Decimal(repr(float(v))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _fold_sum(values) -> float:
    """aggregate(features, cast(0 as double), (a, v) -> a + v): left fold
    in array order with a float64 accumulator."""
    acc = 0.0
    for v in values:
        acc += float(v)
    return acc


def ppm_features(seed: int) -> np.ndarray:
    y, x = np.mgrid[0:PPM_H, 0:PPM_W]
    r = ((x * 7 + seed) % 256).astype(np.uint8).astype(np.float32)
    g = ((y * 13 + 3 * seed) % 256).astype(np.uint8).astype(np.float32)
    b = ((x + y + 5 * seed) % 256).astype(np.uint8).astype(np.float32)
    gray = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
    ys = (np.arange(DIM) * PPM_H) // DIM
    xs = (np.arange(DIM) * PPM_W) // DIM
    return gray[np.ix_(ys, xs)].mean(axis=0).astype(np.float32)


def wav_features(seed: int) -> np.ndarray:
    t = np.arange(WAV_N, dtype=np.float64)
    freq = 110.0 + (seed % 32) * 55.0
    wave = np.sin(2 * np.pi * freq * t / WAV_SR + (seed % 7))
    pcm = (wave * 32000).astype("<i2")
    samples = pcm.astype(np.float32) / 32768.0
    edges = (np.arange(DIM + 1) * WAV_N) // DIM
    out = np.empty(DIM, dtype=np.float32)
    for k in range(DIM):
        w = samples[edges[k] : edges[k + 1]]
        out[k] = np.sqrt(np.mean(np.square(w))) if len(w) else np.float32(0.0)
    return out


def y4m_frame_stats(seed: int) -> tuple[int, int, float]:
    y, x = np.mgrid[0:Y4M_H, 0:Y4M_W]
    kept = range(0, Y4M_FRAMES, Y4M_STRIDE)
    acc = 0.0  # Spark avg: input-order partial sum, then one division
    for f in kept:
        luma = ((x * 3 + y * 5 + f * 17 + seed) % 256).astype(np.uint8)
        acc += float(luma.mean())
    return len(kept), max(kept), _round6(acc / len(kept))


def derive(media_ids: list[int]) -> dict[str, pa.Table]:
    ppm_rows, wav_rows, y4m_rows = [], [], []
    for mid in media_ids:
        pf = ppm_features(mid)
        ppm_rows.append((mid, _round6(_fold_sum(pf)), _round6(float(pf[0]))))
        wf = wav_features(mid)
        wav_rows.append((mid, _round6(_fold_sum(wf)), _round6(float(wf[0]))))
        n_kept, max_idx, avg_luma = y4m_frame_stats(mid)
        y4m_rows.append((mid, n_kept, max_idx, avg_luma))
    return {
        "multimodal_golden_ppm.parquet": pa.table(
            {
                "media_id": pa.array([r[0] for r in ppm_rows], pa.int64()),
                "feature_sum": pa.array([r[1] for r in ppm_rows], pa.float64()),
                "f0": pa.array([r[2] for r in ppm_rows], pa.float64()),
            }
        ),
        "multimodal_golden_wav.parquet": pa.table(
            {
                "media_id": pa.array([r[0] for r in wav_rows], pa.int64()),
                "energy_sum": pa.array([r[1] for r in wav_rows], pa.float64()),
                "rms0": pa.array([r[2] for r in wav_rows], pa.float64()),
            }
        ),
        "multimodal_golden_y4m.parquet": pa.table(
            {
                "media_id": pa.array([r[0] for r in y4m_rows], pa.int64()),
                "n_frames_kept": pa.array([r[1] for r in y4m_rows], pa.int64()),
                "max_idx": pa.array([r[2] for r in y4m_rows], pa.int32()),
                "avg_luma": pa.array([r[3] for r in y4m_rows], pa.float64()),
            }
        ),
    }


def media_id_range() -> list[int]:
    import duckdb

    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{GOLDEN_SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="write instead of check")
    args = ap.parse_args(argv)

    tables = derive(media_id_range())
    if args.write:
        for fname, tbl in tables.items():
            pq.write_table(tbl, os.path.join(OUT, fname))
            print(f"wrote {fname}: {tbl.num_rows} rows")
        return 0

    bad = 0
    for fname, expect in tables.items():
        path = os.path.join(OUT, fname)
        committed = pq.read_table(path).sort_by("media_id")
        expect = expect.sort_by("media_id")
        if committed.schema.names != expect.schema.names:
            print(f"MISMATCH {fname}: columns {committed.schema.names} != {expect.schema.names}")
            bad += 1
            continue
        diffs = 0
        for col in expect.schema.names:
            a, b = committed[col].to_pylist(), expect[col].to_pylist()
            if len(a) != len(b):
                print(f"MISMATCH {fname}.{col}: {len(a)} vs {len(b)} rows")
                diffs += 1
                continue
            ndiff = sum(1 for u, v in zip(a, b) if u != v)
            if ndiff:
                first = next(i for i, (u, v) in enumerate(zip(a, b)) if u != v)
                print(f"MISMATCH {fname}.{col}: {ndiff} values differ (first at row {first}: {a[first]} vs {b[first]})")
                diffs += 1
        if diffs:
            bad += 1
        else:
            print(f"OK {fname}: {expect.num_rows} rows, all fields identical")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
