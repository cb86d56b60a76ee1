"""Evaluation metrics (SURVEY §2.6 G4/G5, §5): CER and a TEDS-style
table-structure similarity.

- CER: whitespace-normalized Levenshtein / len(reference)
  (Scripts/eval_CER.py:55-95; the ``editdistance`` lib is unavailable, so
  the edit distance is a two-row numpy DP — same values).
- TEDS: tree-edit-distance similarity over table structure
  (Scripts/table_diff.py uses the published TEDS lib over PubTabNet HTML;
  here the public Zhang-Shasha ordered-tree edit distance over the
  table->tr->td tree, normalized per the TEDS paper:
  ``1 - TED / max(|Ta|, |Tb|)``), with the paper's cell cost — renaming a
  cell costs the normalized Levenshtein distance of the cell texts.  Our
  table model carries no colspan/rowspan attributes (full TEDS charges 1
  for a span mismatch); the structural unit-cost variant (S-TEDS) remains
  available via ``cell_content_cost=False``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .mdtext import clean_text
from .blocks import parse_html_table


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, vectorized two-row DP."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    ar = np.arange(len(bv) + 1, dtype=np.int64)
    prev = ar.copy()
    for i, ca in enumerate(a):
        cur = np.empty(len(bv) + 1, dtype=np.int64)
        cur[0] = i + 1
        # substitution / match and deletion-from-b candidates (vectorized)
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (bv != ord(ca)))
        # insertion chain cur[j] <= cur[k] + (j - k): unit-step running min
        # via the min-plus prefix identity
        cur = np.minimum(cur, np.minimum.accumulate(cur - ar) + ar)
        prev = cur
    return int(prev[-1])


def cer(reference: str, hypothesis: str) -> Tuple[float, int]:
    """(CER, edit_distance) with the reference's normalization
    (eval_CER.py:63-95): whitespace-collapse both, CER=dist/len(ref),
    empty reference -> (0.0, 0)."""
    ref = clean_text(reference)
    hyp = clean_text(hypothesis)
    if len(ref) == 0:
        return 0.0, 0
    d = levenshtein(ref, hyp)
    return d / len(ref), d


def corpus_cer(pairs: Sequence[Tuple[str, str]]) -> float:
    """Simple mean of per-document CER (eval_CER.py:153-158)."""
    if not pairs:
        return 0.0
    return float(np.mean([cer(r, h)[0] for r, h in pairs]))


# --- TEDS-style tree edit similarity --------------------------------------


class _Node:
    __slots__ = ("label", "children")

    def __init__(self, label: str, children=None):
        self.label = label
        self.children = children or []


def table_tree(rows: List[List[str]]) -> _Node:
    """List[List[str]] (parse_html_table / markdown-table rows) -> tree."""
    return _Node(
        "table",
        [_Node("tr", [_Node("td:" + c) for c in row]) for row in rows],
    )


def _teds_cost(label_a: str, label_b: str) -> float:
    """Published TEDS rename cost (Zhong et al. 2019, eq. 2 — the cost the
    reference's TEDS lib applies, Scripts/table_diff.py:56 via
    ``TEDS.batch_evaluate``): different tags cost 1; two ``<td>`` cells
    cost the NORMALIZED string edit distance of their contents; equal
    non-cell tags cost 0.  (Our table model has no colspan/rowspan
    attributes; in full TEDS a span mismatch also costs 1.)"""
    a_cell = label_a.startswith("td:")
    b_cell = label_b.startswith("td:")
    if a_cell != b_cell:
        return 1.0
    if a_cell:
        ta, tb = label_a[3:], label_b[3:]
        if ta == tb:
            return 0.0
        return levenshtein(ta, tb) / max(len(ta), len(tb))
    return 0.0 if label_a == label_b else 1.0


def html_table_tree(html: str) -> _Node:
    return table_tree(parse_html_table(html))


def _postorder(root: _Node):
    """Returns (labels, lmds, keyroots) for Zhang-Shasha."""
    labels, lmds = [], []
    index = {}

    def walk(n) -> int:
        if not n.children:
            labels.append(n.label)
            lmds.append(len(labels) - 1)
            index[id(n)] = len(labels) - 1
            return len(labels) - 1
        first_lmd = None
        for c in n.children:
            l = walk(c)
            if first_lmd is None:
                first_lmd = lmds[l]
        labels.append(n.label)
        lmds.append(first_lmd)
        index[id(n)] = len(labels) - 1
        return len(labels) - 1

    walk(root)
    n = len(labels)
    keyroots = [i for i in range(n) if i == n - 1 or all(lmds[j] != lmds[i] for j in range(i + 1, n))]
    return labels, lmds, keyroots


def tree_edit_distance(a: _Node, b: _Node, rename_cost=None) -> float:
    """Zhang-Shasha ordered tree edit distance: unit insert/delete,
    pluggable (possibly fractional) rename cost — default unit."""
    cost_fn = rename_cost or (lambda x, y: 0.0 if x == y else 1.0)
    la, lmda, kra = _postorder(a)
    lb, lmdb, krb = _postorder(b)
    na, nb = len(la), len(lb)
    td = np.zeros((na, nb), dtype=np.float64)

    for i in kra:
        for j in krb:
            li, lj = lmda[i], lmdb[j]
            m, n = i - li + 2, j - lj + 2
            fd = np.zeros((m, n), dtype=np.float64)
            fd[:, 0] = np.arange(m)
            fd[0, :] = np.arange(n)
            for x in range(1, m):
                for y in range(1, n):
                    ai, bj = li + x - 1, lj + y - 1
                    if lmda[ai] == li and lmdb[bj] == lj:
                        cost = cost_fn(la[ai], lb[bj])
                        fd[x, y] = min(
                            fd[x - 1, y] + 1, fd[x, y - 1] + 1, fd[x - 1, y - 1] + cost
                        )
                        td[ai, bj] = fd[x, y]
                    else:
                        p, q = lmda[ai] - li, lmdb[bj] - lj
                        fd[x, y] = min(
                            fd[x - 1, y] + 1,
                            fd[x, y - 1] + 1,
                            fd[p, q] + td[ai, bj],
                        )
    return float(td[na - 1, nb - 1])


def _count(n: _Node) -> int:
    return 1 + sum(_count(c) for c in n.children)


def teds(
    rows_a: List[List[str]], rows_b: List[List[str]], cell_content_cost: bool = True
) -> float:
    """TEDS similarity in [0,1]: ``1 - TED / max(|Ta|, |Tb|)``.

    ``cell_content_cost=True`` (default) applies the PUBLISHED TEDS cost:
    substituting one ``<td>`` for another costs the normalized Levenshtein
    distance of the cell texts (Zhong et al. 2019, as used by the
    reference's TEDS lib in Scripts/table_diff.py); ``False`` gives the
    structural unit-cost variant (S-TEDS)."""
    ta, tb = table_tree(rows_a), table_tree(rows_b)
    na, nb = _count(ta), _count(tb)
    if na == 0 and nb == 0:
        return 1.0
    d = tree_edit_distance(ta, tb, _teds_cost if cell_content_cost else None)
    return 1.0 - d / max(na, nb)
