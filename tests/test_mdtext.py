"""Golden in/out pairs for the byte-identity string surface (SURVEY §2.3)."""

from deepseek_ocr_customvllm_ray.functions import mdtext

EOS = "<｜end▁of▁sentence｜>"


def tag(label, coords):
    return f"<|ref|>{label}<|/ref|><|det|>{coords}<|/det|>"


class TestReMatch:
    def test_partition(self):
        text = (
            "Intro " + tag("image", "[[10, 10, 500, 500]]")
            + " mid " + tag("title", "[[1, 2, 3, 4]]")
        )
        matches, images, others = mdtext.re_match(text)
        assert len(matches) == 2
        assert images == [tag("image", "[[10, 10, 500, 500]]")]
        assert others == [tag("title", "[[1, 2, 3, 4]]")]

    def test_multiline_coords(self):
        text = tag("image", "[[1,2,\n3,4]]")
        matches, images, _ = mdtext.re_match(text)
        assert len(matches) == 1 and len(images) == 1

    def test_no_tags(self):
        assert mdtext.re_match("plain text") == ([], [], [])


class TestCoordinateParse:
    def test_ok(self):
        m = ("full", "image", "[[10, 20, 30, 40], [1, 2, 3, 4]]")
        assert mdtext.extract_coordinates_and_label(m) == (
            "image",
            [[10, 20, 30, 40], [1, 2, 3, 4]],
        )

    def test_reject_garbage(self):
        assert mdtext.extract_coordinates_and_label(("f", "image", "[[1,2,")) is None

    def test_reject_code(self):
        # eval would execute this; the safe parser must reject it
        assert (
            mdtext.extract_coordinates_and_label(("f", "image", "__import__('os')"))
            is None
        )


class TestDenormalizeBox:
    def test_scale_and_truncate(self):
        # 999-grid on a 999x999 image is identity
        assert mdtext.denormalize_box([10, 20, 30, 40], 999, 999) == (10, 20, 30, 40)

    def test_clamp(self):
        assert mdtext.denormalize_box([0, 0, 2000, 2000], 100, 50) == (0, 0, 100, 50)

    def test_inverted_corners_swap(self):
        assert mdtext.denormalize_box([500, 600, 100, 200], 999, 999) == (
            100, 200, 500, 600,
        )


class TestExtractContent:
    def test_image_replacement_and_eos(self):
        text = "Before " + tag("image", "[[1,1,500,500]]") + " after" + EOS
        out = mdtext.extract_content(text, "job42")
        assert out == "Before ![](./job42/images/0.jpg)\n after"

    def test_other_refs_deleted(self):
        text = "A " + tag("text", "[[1,1,2,2]]") + "B"
        assert mdtext.extract_content(text, "j") == "A B"

    def test_latex_no_trailing_space(self):
        assert mdtext.extract_content(r"x \coloneqq y \eqqcolon z", "j") == "x := y =: z"

    def test_exact_count_newline_collapse(self):
        # \n\n\n\n -> \n\n then \n\n\n -> \n\n ; five newlines become
        # (4->2) + leftover 1 = 3 -> handled by the second replace? No:
        # "a\n\n\n\n\nb": first replace eats the first 4 -> "a\n\n\nb",
        # second replace -> "a\n\nb".
        assert mdtext.extract_content("a\n\n\n\n\nb", "j") == "a\n\nb"
        assert mdtext.extract_content("a\n\n\nb", "j") == "a\n\nb"
        assert mdtext.extract_content("a\n\nb", "j") == "a\n\nb"


class TestCleanPageContent:
    def test_image_link_uses_page_and_enum(self):
        text = tag("image", "[[1,1,500,500]]") + " t " + tag("image", "[[1,1,400,400]]")
        out = mdtext.clean_page_content(text, 3)
        assert out == "![](images/3_0.jpg)\n t ![](images/3_1.jpg)\n"

    def test_latex_trailing_space_divergence(self):
        # the clean-markdown branch emits '=: ' WITH trailing space
        assert mdtext.clean_page_content(r"a \eqqcolon b", 0) == "a =:  b"

    def test_regex_newline_collapse(self):
        assert mdtext.clean_page_content("a\n\n\n\n\n\nb", 0) == "a\n\nb"


class TestFigureCrops:
    def test_names_count_only_saved(self):
        # one big image box, one tiny (skipped), one non-image label
        text = (
            tag("image", "[[0, 0, 500, 500]]")
            + tag("image", "[[10, 10, 11, 11]]")
            + tag("table", "[[0, 0, 900, 900]]")
        )
        crops = mdtext.figure_crop_boxes(text, 7, 999, 999)
        assert [c[0] for c in crops] == ["7_0.jpg"]

    def test_multibox_single_ref(self):
        text = tag("image", "[[0,0,100,100],[200,200,400,400]]")
        crops = mdtext.figure_crop_boxes(text, 0, 999, 999)
        assert [c[0] for c in crops] == ["0_0.jpg", "0_1.jpg"]
        assert crops[1][1] == (200, 200, 400, 400)


class TestMergeCleanPages:
    def test_marker_and_tail(self):
        assert mdtext.merge_clean_pages(["p1", "p2"]) == "p1\n\n\n\np2\n\n\n\n\n"
        assert mdtext.merge_clean_pages([]) == "\n"


class TestHeuristics:
    def test_date_split(self):
        assert (
            mdtext.apply_regex_heuristics("Ngày 12/05/2024 ký")
            == "Ngày | 12/05/2024 | ký"
        )

    def test_date_only(self):
        assert mdtext.apply_regex_heuristics("1/2/2024") == "1/2/2024"

    def test_letter_digit(self):
        assert mdtext.apply_regex_heuristics("abc123") == "abc | 123"

    def test_empty_passthrough(self):
        assert mdtext.apply_regex_heuristics("") == ""
        assert mdtext.apply_regex_heuristics("   ") == "   "


class TestEvalSideNormalizers:
    def test_clean_formula(self):
        assert (
            mdtext.clean_formula(r"\[x + y \quad (1)\] end")
            == r"\[x + y\] end"
        )

    def test_clean_text_refined(self):
        s = "# Head\n\n<--- Page Split --->\n\n**bold** | a-b"
        assert mdtext.clean_text_refined(s) == "Head bold ab"

    def test_clean_text(self):
        assert mdtext.clean_text("  a \n b\t c ") == "a b c"


class TestHeadingTracking:
    def test_last_level(self):
        assert mdtext.last_heading_level("# a\ntext\n### b\n", 0) == 3
        assert mdtext.last_heading_level("no heading", 2) == 2


class TestBatchCliClean:
    def tag(self, label, coords):
        return f"<|ref|>{label}<|/ref|><|det|>{coords}<|/det|>"

    def test_no_tags_is_noop_even_with_newlines(self):
        # quirk: the collapse chain only runs per tag match
        s = "a\n\n\n\nb <center>x</center>"
        assert mdtext.batch_cli_clean(s) == s

    def test_tagged_page_cleans(self):
        s = self.tag("title", "[[1,2,3,4]]") + "head\n\n\n\nbody <center>c</center>"
        out = mdtext.batch_cli_clean(s)
        assert out == "head\n\nbody c"

    def test_formula_cleaned(self):
        s = r"\[x \quad (1)\]" + self.tag("t", "[[1,1,2,2]]")
        assert mdtext.batch_cli_clean(s) == r"\[x\]"
