#!/usr/bin/env python3
"""Flip-clustering study for corpus-scaled phash width (round-7 prep).

Reimplements Multimodal.phashStub with a variable block count B
(fingerprint bits), plants the same every-11th-byte +1 re-encode
variants, and measures for B in {64, 128, 256}:
  - planted-pair hamming distribution (flips over B bits)
  - P(at least one clean band) for band widths w in {16, 32}
  - random-pair expected band-collision rate (bit balance check)
Sampled from /tmp/sf10 documents (the corpus the scaladoc names).
"""
import pyarrow.parquet as pq
import random, collections

def phash(payload: bytes, B: int) -> int:
    n = len(payload)
    fp = 0
    for j in range(B):
        lo, hi = j * n // B, (j + 1) * n // B
        ones = 0
        first = 0
        for k in range(lo, hi):
            nib = payload[k] >> 4
            a = (k * 2654435761 + nib * 40503) & 0xFFFFFFFF
            a ^= a >> 16
            a = (a * 1540483477) & 0xFFFFFFFF
            a ^= a >> 16
            if k == lo:
                first = a & 1
            ones += a & 1
        if hi == lo:
            bit = 0
        elif ones * 2 > hi - lo:
            bit = 1
        elif ones * 2 == hi - lo:
            bit = first
        else:
            bit = 0
        fp = (fp << 1) | bit
    return fp

def variant(payload: bytes) -> bytes:
    return bytes(((b + 1) & 0xFF) if i % 11 == 0 else b
                 for i, b in enumerate(payload))

def bands(x: int, B: int, w: int):
    nb = B // w
    return [(x >> (w * i)) & ((1 << w) - 1) for i in range(nb)]

t = pq.read_table('/tmp/sf10/documents.parquet', columns=['doc_id', 'text'])
df = t.to_pandas()
planted = df[df.doc_id % 7 == 0].sample(n=3000, random_state=42)
rnd = df.sample(n=2000, random_state=7)

print(f"sample: {len(planted)} planted docs, {len(rnd)} random docs")
for B in (64, 128, 256):
    hams = []
    clean = collections.Counter()
    for txt in planted.text:
        p = txt.encode('utf-8')
        a, b = phash(p, B), phash(variant(p), B)
        x = a ^ b
        hams.append(bin(x).count('1'))
        for w in (16, 32):
            ba, bb = bands(a, B, w), bands(b, B, w)
            if any(u == v for u, v in zip(ba, bb)):
                clean[w] += 1
    hams.sort()
    n = len(hams)
    # bit balance for random-collision estimate
    ones = collections.Counter()
    fps = [phash(t.encode('utf-8'), B) for t in rnd.text]
    for fp in fps:
        for i in range(B):
            ones[i] += (fp >> i) & 1
    worst_bias = max(abs(c / len(fps) - 0.5) for c in ones.values())
    # empirical random band-collision probability per pair (w=16 too dense
    # to sample directly at w=32; report bias-derived expectation)
    print(f"B={B:3d}: planted hamming p50={hams[n//2]} p90={hams[9*n//10]} "
          f"p99={hams[99*n//100]} max={hams[-1]} (thr bits/8 = {B//8}); "
          f"recall w16={clean[16]/n:.4f} w32={clean[32]/n:.4f}; "
          f"worst bit bias {worst_bias:.3f}")
