"""Frequent Directions matrix sketch over embedding rows.

North-rule companion sketch for the ``embeddings`` table: where Count-Min
summarizes a frequency VECTOR, Frequent Directions (Liberty, KDD 2013;
Ghashami-Liberty-Phillips-Woodruff, SIAM J. Comput. 2016) summarizes the
GRAM MATRIX of a tall row-matrix A (n x d of embedding vectors) with an
ell x d sketch B such that

    0 <= A'A - B'B  (PSD)   and   ||A'A - B'B||_2 <= ||A||_F^2 / ell.

This powers approximate PCA / covariance / subspace queries over the
embedding column without ever shuffling the vectors: each partition folds
its rows into a local sketch, partials merge associatively (the mergeable-
summaries result of GLPW16: the deterministic bound survives ANY merge
tree, so the same tree-merge topology used for Count-Min partials applies
unchanged).

Unlike the hash sketches in this library, FD merge results are NOT
byte-identical across merge orders -- the bound is what is
order-invariant, not the bytes. The sketch therefore carries its own
deterministic error CERTIFICATE: ``shrink_total``, the sum of all shrink
deltas applied, satisfies ||A'A - B'B||_2 <= shrink_total <= fro2/ell
no matter how partials were merged, and is exact arithmetic the query
layer can self-assert against (cf. the reference's one-sided Count-Min
guarantee, cm.h:118-131 -- same pattern: an a-posteriori certificate
stronger than the a-priori bound).

Mergeable aggregator contract (same skeleton as sketchlib.theta): zero-arg
factory via functools.partial, ``update_batch`` on flat numpy (the generic
builders flatten list<float> columns -- rows are recovered by reshaping to
``dim``), ``merge``/``to_bytes``/``from_bytes``/``n_items``. update and
compaction are pure NumPy (one LAPACK SVD of a 2*ell x d buffer per
compaction); no per-row Python.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"FDR1"
_VERSION = 1
_HEADER = "<4sHHqqqddq"


class FrequentDirections:
    """FD sketch with ``ell`` directions over ``dim``-dimensional rows.

    Internally buffers up to ``2*ell`` rows; a full buffer is compacted by
    one SVD: singular values shrink by delta = s[ell]^2 which zeroes every
    row past the first ``ell``. ``fro2`` tracks the exact squared Frobenius
    norm of ALL input absorbed (mergeable by addition); ``shrink_total``
    accumulates the deltas -- the a-posteriori error certificate.
    """

    __slots__ = ("ell", "dim", "buf", "n_buf", "n_items", "fro2",
                 "shrink_total")

    def __init__(self, ell: int = 32, dim: int = 64) -> None:
        if ell < 2:
            raise ValueError("ell must be >= 2")
        if dim < 1:
            raise ValueError("dim must be >= 1")
        self.ell = int(ell)
        self.dim = int(dim)
        self.buf = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
        self.n_buf = 0
        self.n_items = 0          # input ROWS absorbed (not floats)
        self.fro2 = 0.0           # exact ||A||_F^2 of absorbed input
        self.shrink_total = 0.0   # sum of compaction deltas (certificate)

    # -- updates ------------------------------------------------------------

    def update_batch(self, values) -> None:
        """Absorb rows. Accepts an (n, dim) matrix or a FLAT 1-D array of
        length n*dim (the shape the generic Spark builders deliver after
        flattening a list<float> column -- Arrow batches hold whole rows,
        so the flat length is always a multiple of ``dim``)."""
        x = np.asarray(values)
        if x.ndim == 1:
            if x.shape[0] % self.dim:
                raise ValueError(
                    f"flat input length {x.shape[0]} is not a multiple of "
                    f"dim={self.dim}")
            x = x.reshape(-1, self.dim)
        elif x.ndim != 2 or x.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) rows, got {x.shape}")
        if x.shape[0] == 0:
            return
        x = x.astype(np.float64, copy=False)
        self.n_items += x.shape[0]
        self.fro2 += float(np.einsum("ij,ij->", x, x))
        self._absorb_rows(x, count_fro=False)

    def _absorb_rows(self, x: np.ndarray, *, count_fro: bool) -> None:
        """Append rows chunk-by-chunk, compacting whenever the buffer
        fills. ``count_fro`` is False for raw input (already counted
        exactly in update_batch) and False for merged sketch rows too --
        fro2 is transferred additively in merge(), never recomputed from
        shrunk rows."""
        del count_fro  # signature kept explicit for the contract above
        cap = self.buf.shape[0]
        i = 0
        n = x.shape[0]
        while i < n:
            take = min(cap - self.n_buf, n - i)
            self.buf[self.n_buf:self.n_buf + take] = x[i:i + take]
            self.n_buf += take
            i += take
            if self.n_buf == cap:
                self._compact()

    def _compact(self) -> None:
        """One FD shrink step: SVD the buffer, subtract delta = s[ell]^2
        from every squared singular value, keep the (at most ell) survivors.
        Reduces ||B||_F^2 by >= (ell+1)*delta, which is what caps
        shrink_total at fro2/ell (Liberty 2013, Thm 1.1)."""
        if self.n_buf == 0:
            return
        a = self.buf[:self.n_buf]
        try:
            _, s, vt = np.linalg.svd(a, full_matrices=False)
        except np.linalg.LinAlgError:
            # gesdd non-convergence: a genuinely different algorithm —
            # eigendecomposition (syevd) of the small Gram side A@A',
            # m x m with m = n_buf <= 2*ell. Squares the condition
            # number, fine for a last-resort path; singular vectors are
            # recovered as V' = U'A / s (zero rows for null directions).
            lam, u = np.linalg.eigh(a @ a.T)
            order = np.argsort(lam)[::-1]
            lam, u = lam[order], u[:, order]
            s = np.sqrt(np.maximum(lam, 0.0))
            vt = np.zeros((s.shape[0], a.shape[1]))
            nz = s > (s[0] * 1e-12 if s.size and s[0] > 0 else 0.0)
            if nz.any():
                vt[nz] = (u[:, nz].T @ a) / s[nz, None]
        if s.shape[0] <= self.ell:
            # fewer directions than ell: nothing to shrink, just re-pack
            rows = s[:, None] * vt
            self.buf[:rows.shape[0]] = rows
            self.buf[rows.shape[0]:] = 0.0
            self.n_buf = rows.shape[0]
            return
        delta = float(s[self.ell] ** 2)
        s2 = np.maximum(s[:self.ell] ** 2 - delta, 0.0)
        rows = np.sqrt(s2)[:, None] * vt[:self.ell]
        nz = int(np.count_nonzero(s2))
        self.buf[:self.ell] = rows
        self.buf[self.ell:] = 0.0
        self.n_buf = max(nz, 0)
        self.shrink_total += delta

    # -- results ------------------------------------------------------------

    def rows(self) -> np.ndarray:
        """Current sketch rows B (k x dim, k <= 2*ell-1). B'B is the Gram
        estimate; no compaction is forced, so this is exact for streams
        shorter than the buffer."""
        return self.buf[:self.n_buf].copy()

    def gram(self) -> np.ndarray:
        """B'B -- the (dim x dim) Gram-matrix estimate of A'A."""
        b = self.buf[:self.n_buf]
        return b.T @ b

    def cov_error_bound(self) -> float:
        """A-priori deterministic bound on ||A'A - B'B||_2."""
        return self.fro2 / self.ell

    def error_certificate(self) -> float:
        """A-posteriori bound: total shrinkage actually applied. Always
        <= cov_error_bound(); the true spectral error is <= this."""
        return self.shrink_total

    def top_directions(self, k: int) -> np.ndarray:
        """Top-k approximate right singular vectors of A (k x dim)."""
        b = self.buf[:self.n_buf]
        if b.shape[0] == 0:
            return np.zeros((0, self.dim))
        _, _, vt = np.linalg.svd(b, full_matrices=False)
        return vt[:k]

    # -- merge --------------------------------------------------------------

    def _check(self, other: "FrequentDirections") -> None:
        if not isinstance(other, FrequentDirections):
            raise ValueError("cannot merge FrequentDirections with "
                             f"{type(other).__name__}")
        if (self.ell, self.dim) != (other.ell, other.dim):
            raise ValueError("FrequentDirections configs differ")

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        """In-place merge: absorb the other sketch's rows as a proxy
        stream (GLPW16 Sec. 3 -- FD is a mergeable summary; the combined
        certificate is the sum of both certificates plus any new shrink)."""
        self._check(other)
        self.n_items += other.n_items
        self.fro2 += other.fro2
        self.shrink_total += other.shrink_total
        if other.n_buf:
            self._absorb_rows(other.buf[:other.n_buf].astype(np.float64),
                              count_fro=False)
        return self

    # -- misc ---------------------------------------------------------------

    def clear(self) -> None:
        self.buf[:] = 0.0
        self.n_buf = 0
        self.n_items = 0
        self.fro2 = 0.0
        self.shrink_total = 0.0

    def nbytes(self) -> int:
        return self.buf.nbytes

    # -- serialization (magic-dispatched via sketchlib.serde) ---------------

    def to_bytes(self) -> bytes:
        head = struct.pack(_HEADER, _MAGIC, _VERSION, 0, self.ell, self.dim,
                           self.n_items, self.fro2, self.shrink_total,
                           self.n_buf)
        return head + np.ascontiguousarray(
            self.buf[:self.n_buf]).tobytes()

    @staticmethod
    def from_bytes(buf: bytes) -> "FrequentDirections":
        hs = struct.calcsize(_HEADER)
        (magic, ver, _pad, ell, dim, n_items, fro2, shrink_total,
         n_rows) = struct.unpack(_HEADER, buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad FrequentDirections serialization")
        body = np.frombuffer(buf[hs:], dtype=np.float64)
        if body.shape[0] != n_rows * dim:
            raise ValueError("truncated FrequentDirections blob")
        fd = FrequentDirections(ell=ell, dim=dim)
        fd.buf[:n_rows] = body.reshape(n_rows, dim)
        fd.n_buf = int(n_rows)
        fd.n_items = int(n_items)
        fd.fro2 = float(fro2)
        fd.shrink_total = float(shrink_total)
        return fd
