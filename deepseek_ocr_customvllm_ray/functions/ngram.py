"""Sliding-window no-repeat-n-gram suppression (decode-time analog).

The reference bans, at each decode step, any token that would complete an
n-gram whose (n-1)-prefix already occurred within the last ``window_size``
tokens, with a whitelist of table-cell tokens
(process/ngram_norepeat.py:7-40; wired with ngram_size=20, window_size=50,
whitelist {<td>,</td>} at app/core/model_init.py:44-48; the batch CLI uses
40/90 at Scripts/run_batch.py:37).

The mock engine has no logits to rescore, so the observable "repeat-collapse"
behaviour is reproduced deterministically over word tokens: walking the
would-be emission, a token that the reference would have banned at that step
is simply not emitted.  This is exactly the reference's effect on a greedy
decoder whose next-best continuation is the following source token.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Set


_POWERS_CACHE: dict = {}


def _powers_of(n: int):
    """Cached descending powers of the poly-hash base (pure function of n,
    recomputed per page uncached)."""
    p = _POWERS_CACHE.get(n)
    if p is None:
        import numpy as np

        p = np.uint64(1099511628211) ** np.arange(n - 1, -1, -1, dtype=np.uint64)
        _POWERS_CACHE[n] = p
    return p


def _has_potential_repeat(
    tokens: Sequence[str],
    ngram_size: int,
    window_size: int,
    whitelist: Set[str] = frozenset(),
) -> bool:
    """Vectorized pre-check: would the sequential suppressor ban anything?
    Works on the ORIGINAL stream — before the first ban the emitted stream
    equals the input, so the first ban (if any) is decided by the input
    alone; hence ``False`` proves the suppressor is the identity.

    EXACT (round 4): a ban at step t requires two equal FULL n-grams at
    starts ``i < j = t-n+1`` with ``j - i <= window_size - ngram_size + 1``
    and a non-whitelisted completion, so the detector hashes n-grams,
    sorts, and exact-verifies the few adjacent equal-hash pairs inside the
    gap bound in Python (equal-gram runs share one completion token, so
    per-run whitelist filtering is sound; a hash collision conservatively
    over-flags).  Round 3's conservative version (prefix hashes + window
    slack, no whitelist) sent ~2.6% of bench pages down a ~4 ms exact walk
    that then changed nothing; this version flags exactly the pages the
    walk will edit.  Cost: one hash pass + one (T, n) uint64 matmul + one
    argsort — numpy-speed O(T log T) vs the Python per-token loop.
    """
    import numpy as np

    n = ngram_size
    T = len(tokens)
    if n < 2 or T < n:
        return T >= n  # ngram_size == 1 has its own loop: no claim
    max_gap = window_size - n + 1
    if max_gap < 1:
        return False  # window too small for any prefix to recur: identity
    # token ids via C-level hash(): equal tokens always hash equal (the
    # property the detector needs).  np.unique on an object array measured
    # ~10x slower (string sorting); list(map(...)) beats an np.fromiter
    # generator by ~3x (no per-item generator resume).
    ids = np.array(list(map(hash, tokens)), dtype=np.int64).view(np.uint64)
    powers = _powers_of(n)
    grams = np.lib.stride_tricks.sliding_window_view(ids, n)
    H = grams @ powers  # uint64 wraparound poly hash per n-gram
    order = np.argsort(H, kind="stable")  # stable: equal hashes in pos order
    hs = H[order]
    same = hs[1:] == hs[:-1]
    if not same.any():
        return False
    gap = order[1:] - order[:-1]
    cand = np.flatnonzero(same & (gap <= max_gap))
    # exact verify of the (few) candidates: true gram equality + whitelist
    for c in cand:
        i, j = int(order[c]), int(order[c + 1])
        if tokens[i:i + n] != tokens[j:j + n]:
            return True  # hash collision: defer to the exact walk
        if tokens[j + n - 1] not in whitelist:
            return True
    return False


def suppress_repeats(
    tokens: Sequence[str],
    ngram_size: int = 20,
    window_size: int = 50,
    whitelist: Iterable[str] = ("<td>", "</td>"),
) -> List[str]:
    """Filter ``tokens`` so no banned n-gram completion is emitted.

    Mirrors NoRepeatNGramLogitsProcessor.__call__ per emitted step:
    - fewer than ``ngram_size`` emitted tokens -> nothing banned;
    - prefix = last (n-1) emitted tokens; scan emitted[-window_size:] for
      n-grams sharing that prefix; their completions are banned;
    - whitelisted tokens are never banned.
    """
    if not isinstance(ngram_size, int) or ngram_size <= 0:
        raise ValueError(f"`ngram_size` has to be a strictly positive integer, but is {ngram_size}")
    if not isinstance(window_size, int) or window_size <= 0:
        raise ValueError(f"`window_size` has to be a strictly positive integer, but is {window_size}")
    wl: Set[str] = set(whitelist or ())
    if ngram_size > 1 and not _has_potential_repeat(
        tokens, ngram_size, window_size, wl
    ):
        return list(tokens)  # proven identity: skip the sequential walk
    out: List[str] = []
    if ngram_size == 1:
        # degenerate case: every previously-seen in-window token is banned
        for tok in tokens:
            start = max(0, len(out) - window_size)
            if tok not in wl and tok in out[start : len(out) + 1]:
                continue
            out.append(tok)
        return out

    # Rolling index: hash((n-1)-gram starting at i) -> [i, ...], built as
    # tokens are emitted.  Banning check = one dict lookup + exact verify of
    # the few in-window candidates — O(1) amortized vs O(window * n) for the
    # naive scan (the reference's torch implementation scans; the semantics
    # here are identical, including the window arithmetic).
    P = ngram_size - 1
    tok_hash: dict = {}

    def h(w: str) -> int:
        v = tok_hash.get(w)
        if v is None:
            import zlib

            v = zlib.crc32(w.encode("utf-8"))
            tok_hash[w] = v
        return v

    B = 1000003
    M = (1 << 61) - 1
    BP = pow(B, P - 1, M)  # for removing the oldest token from the window
    occ: dict = {}  # prefix_hash -> list of start positions
    roll = 0  # hash of the last P emitted tokens (when len(out) >= P)

    for tok in tokens:
        L = len(out)
        if L >= ngram_size and tok not in wl:
            # candidate (n-1)-gram starts i in [max(0, L-window), L-n+1):
            # ban tok if out[i:i+P] == out[L-P:L] and out[i+P] == tok
            lo = max(0, L - window_size)
            hi = L - ngram_size + 1  # exclusive
            banned = False
            positions = occ.get(roll, ())
            # positions are appended in increasing order; scan newest-first
            # and stop once below the window so periodic inputs stay O(window)
            for i in reversed(positions):
                if i < lo:
                    break
                if i < hi and out[i + P] == tok and out[i : i + P] == out[L - P : L]:
                    banned = True
                    break
            if banned:
                continue
        # emit tok; update rolling hash + index for the P-gram ENDING at the
        # new position (i.e. starting at L - P + 1)
        out.append(tok)
        L = len(out)
        if L >= P:
            if L == P:
                r = 0
                for w in out:
                    r = (r * B + h(w)) % M
                roll = r
            else:
                roll = ((roll - h(out[L - P - 1]) * BP) * B + h(out[L - 1])) % M
            occ.setdefault(roll, []).append(L - P)
    return out


def suppress_repeats_text(
    text: str,
    ngram_size: int = 20,
    window_size: int = 50,
    whitelist: Iterable[str] = ("<td>", "</td>"),
) -> str:
    """Apply :func:`suppress_repeats` to whitespace tokens, preserving
    newline structure: each line is tokenized on spaces, the suppressor runs
    over the whole document stream with ``"\\n"`` as an ordinary token so
    cross-line repeats are caught like the decoder's flat token stream.

    Pages where NOTHING is suppressed return byte-identically (the common
    case, and required so the suppressor never perturbs repeat-free input);
    when suppression fires, reassembly normalizes runs of spaces — the
    decode output changed anyway.
    """
    toks: List[str] = []
    for i, line in enumerate(text.split("\n")):
        if i:
            toks.append("\n")
        toks.extend([t for t in line.split(" ") if t != ""])
    kept = suppress_repeats(toks, ngram_size, window_size, whitelist)
    if len(kept) == len(toks):
        return text  # nothing banned -> byte-identical passthrough
    # Reassemble: newline tokens delimit lines; other tokens joined by spaces.
    lines: List[List[str]] = [[]]
    for t in kept:
        if t == "\n":
            lines.append([])
        else:
            lines[-1].append(t)
    return "\n".join(" ".join(ws) for ws in lines)
