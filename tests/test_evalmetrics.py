"""CER + TEDS-style eval metrics (SURVEY §2.6 G4/G5, §5)."""

import random

from deepseek_ocr_customvllm_ray.functions import evalmetrics as em


def naive_lev(a, b):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i][j] = min(
                dp[i - 1][j] + 1,
                dp[i][j - 1] + 1,
                dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return dp[m][n]


class TestLevenshtein:
    def test_basics(self):
        assert em.levenshtein("", "") == 0
        assert em.levenshtein("abc", "") == 3
        assert em.levenshtein("", "abc") == 3
        assert em.levenshtein("kitten", "sitting") == 3

    def test_differential(self):
        rng = random.Random(5)
        for _ in range(100):
            a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 15)))
            b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 15)))
            assert em.levenshtein(a, b) == naive_lev(a, b), (a, b)

    def test_unicode(self):
        assert em.levenshtein("tổng cộng", "tong cộng") == 1
        assert em.levenshtein("tổng", "tổng") == 0


class TestCer:
    def test_identical(self):
        assert em.cer("a b  c", "a b c") == (0.0, 0)

    def test_empty_reference(self):
        assert em.cer("", "anything") == (0.0, 0)

    def test_ratio(self):
        c, d = em.cer("abcd", "abxd")
        assert d == 1 and c == 0.25

    def test_corpus_mean(self):
        assert em.corpus_cer([("abcd", "abcd"), ("abcd", "abxd")]) == 0.125


class TestTeds:
    def test_identical_tables(self):
        rows = [["a", "b"], ["1", "2"]]
        assert em.teds(rows, rows) == 1.0

    def test_cell_change_penalized(self):
        a = [["a", "b"], ["1", "2"]]
        b = [["a", "b"], ["1", "999"]]
        s = em.teds(a, b)
        assert 0.8 < s < 1.0

    def test_structure_change_penalized_more(self):
        a = [["a", "b"], ["1", "2"]]
        b = [["a"], ["1"]]
        assert em.teds(a, b) < em.teds(a, [["a", "b"], ["1", "999"]])

    def test_disjoint(self):
        assert em.teds([["x"]], [["y"]]) < 1.0

    def test_html_tree(self):
        t = em.html_table_tree("<table><tr><td>a</td></tr></table>")
        assert t.label == "table" and t.children[0].label == "tr"


class TestTedsFullCellCost:
    """Hand-computed scores for the published TEDS cost (cell rename =
    normalized Levenshtein of cell texts)."""

    def test_single_cell_edit(self):
        # table(tr(td:cat, td:dog)) = 4 nodes; rename td:dog -> td:dgo costs
        # lev(dog, dgo)/3 = 2/3; TEDS = 1 - (2/3)/4 = 5/6
        a = [["cat", "dog"]]
        b = [["cat", "dgo"]]
        assert abs(em.teds(a, b) - 5 / 6) < 1e-12
        # structural variant charges a full unit: 1 - 1/4
        assert em.teds(a, b, cell_content_cost=False) == 0.75

    def test_half_cell_edit(self):
        # 3 nodes; lev(ab, ax)/2 = 1/2; TEDS = 1 - 0.5/3
        assert abs(em.teds([["ab"]], [["ax"]]) - (1 - 0.5 / 3)) < 1e-12

    def test_empty_vs_text_cell_costs_full_unit(self):
        # lev("", xy)/max(0,2) = 1.0 -> same as structural
        assert abs(em.teds([[""]], [["xy"]]) - (1 - 1 / 3)) < 1e-12

    def test_row_deletion_same_in_both_variants(self):
        # delete tr + td:b: TED=2 over max 5 nodes -> 0.6
        a = [["a"], ["b"]]
        b = [["a"]]
        assert abs(em.teds(a, b) - 0.6) < 1e-12
        assert abs(em.teds(a, b, cell_content_cost=False) - 0.6) < 1e-12

    def test_near_cell_beats_disjoint_cell(self):
        base = [["hello world"]]
        assert em.teds(base, [["hello wxrld"]]) > em.teds(base, [["zzz"]])
