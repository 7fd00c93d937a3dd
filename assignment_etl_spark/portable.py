"""The portable-hash family's shared constants.

One definition for every module that derives cross-engine-replayable
hashes (ext/sampling.py uniforms, ext/text.py split buckets, ext/dedup.py
LSH signatures) AND for every DuckDB oracle replica generated from them:
a change here re-derives both sides together; private copies would
silently desynchronize an engine from its oracle.

P = 2^31 - 1 (Mersenne): with every operand < 2^31 and the multiplier
< 2^31, all products stay inside int64, so any engine with 64-bit integer
arithmetic computes identical values. A and B are the classic glibc LCG
constants — the quality bar here is "uniform enough to split/sample by",
not cryptographic; adversarial inputs call for xxhash64 (not portable to
DuckDB) as documented at each call site.
"""

MULT_A = 1103515245
ADD_B = 12345
PRIME_P = (1 << 31) - 1

# xor-shift distance used by the non-linear mixing step in
# ext/sampling.portable_hash01 (affine∘affine is still affine, so a pure
# LCG chain would leave the uniform an affine image of the id; one
# xor-shift between rounds breaks the lattice)
XSHIFT = 15
