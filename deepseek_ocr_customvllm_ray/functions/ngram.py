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
    out: List[str] = []
    for tok in tokens:
        if len(out) >= ngram_size and tok not in wl:
            prefix = tuple(out[-(ngram_size - 1):]) if ngram_size > 1 else ()
            start = max(0, len(out) - window_size)
            end = len(out) - ngram_size + 1
            banned: Set[str] = set()
            for i in range(start, end):
                ngram = tuple(out[i : i + ngram_size])
                if ngram[:-1] == prefix:
                    banned.add(ngram[-1])
            if tok in banned:
                continue
        out.append(tok)
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
    cross-line repeats are caught like the decoder's flat token stream."""
    toks: List[str] = []
    for i, line in enumerate(text.split("\n")):
        if i:
            toks.append("\n")
        toks.extend(t for t in line.split(" ") if t != "")
    kept = suppress_repeats(toks, ngram_size, window_size, whitelist)
    # Reassemble: newline tokens delimit lines; other tokens joined by spaces.
    lines: List[List[str]] = [[]]
    for t in kept:
        if t == "\n":
            lines.append([])
        else:
            lines[-1].append(t)
    return "\n".join(" ".join(ws) for ws in lines)
