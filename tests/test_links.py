"""Link-graph extraction (stages/links.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deepseek_ocr_customvllm_ray.stages.links import (
    collect_links,
    host_edges,
    host_in_links,
    make_page_links_batch,
    page_out_links,
)


def _pages(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array(
            [r[1].encode("utf-8") if isinstance(r[1], str) else r[1] for r in rows],
            pa.binary(),
        ),
    })


class TestCollectLinks:
    def test_document_order_and_anchor_normalization(self):
        html = '<p><a href="/a">one\n  two</a> x <a href="/b"> three </a></p>'
        assert collect_links(html) == [
            ("/a", "one two", False),
            ("/b", "three", False),
        ]

    def test_nofollow_multi_token_rel(self):
        html = (
            '<a href="/x" rel="noopener nofollow">a</a>'
            '<a href="/y" rel="noopener">b</a>'
        )
        assert [(h, nf) for h, _, nf in collect_links(html)] == [
            ("/x", True), ("/y", False)
        ]

    def test_nested_anchor_text_goes_to_innermost(self):
        html = '<a href="/out">outer <a href="/in">inner</a></a>'
        out = dict((h, t) for h, t, _ in collect_links(html))
        assert out["/in"] == "inner"
        assert out["/out"] == "outer"

    def test_hrefless_and_bold_nested_text(self):
        html = '<a name="top">skip</a><a href="/k">read <b>doc</b> 5</a>'
        assert collect_links(html) == [("/k", "read doc 5", False)]

    def test_hostile_markup_keeps_clean_prefix(self):
        assert collect_links('<a href="/a">ok</a><a href="/b') == [
            ("/a", "ok", False)
        ]

    def test_nofollow_rel_is_case_insensitive(self):
        html = '<a href="/x" rel="NoFollow">a</a><a href="/y" rel="NOFOLLOW ugc">b</a>'
        assert [(h, nf) for h, _, nf in collect_links(html)] == [
            ("/x", True), ("/y", True)
        ]

    def test_block_wrapped_anchor_keeps_its_text(self):
        # HTML5 card markup: block content inside <a> IS the anchor text
        # (browsers keep anchors open across block boundaries; an earlier
        # revision cleared open anchors on block tags and lost this)
        html = '<a href="/card"><div><h3>Read more</h3><p>about x</p></div></a>'
        out = dict((h, t) for h, t, _ in collect_links(html))
        assert out["/card"] == "Read more about x"

    def test_unclosed_anchor_bounded_by_cap_not_blocks(self):
        # a missing </a> attributes following content to the anchor (what
        # a browser's adoption agency does too); the char cap bounds it
        html = (
            '<a href="/open">label<p>trailing paragraph</p>'
            '<a href="/next">next</a>'
        )
        out = dict((h, t) for h, t, _ in collect_links(html))
        assert out["/open"].startswith("label trailing paragraph")
        assert out["/next"] == "next"

    def test_anchor_text_capped_on_never_closing_anchor(self):
        html = '<a href="/cap">' + ("word " * 5000)  # never closes, no blocks
        (href, text, _nf), = collect_links(html)
        assert href == "/cap"
        assert len(text) <= 4096


class TestBatchKernel:
    def test_resolution_drop_and_link_no(self):
        fn = make_page_links_batch()
        out = fn(_pages([(
            "https://h.example/d/1",
            '<a href="/">r</a><a href="mailto:x@y.z">m</a>'
            '<a href="javascript:void(0)">j</a>'
            '<a href="https://other.example/p">abs</a>'
            '<a href="sub/page">rel</a>',
        )]))
        assert out["dst_url"].to_pylist() == [
            "https://h.example/",
            "https://other.example/p",
            "https://h.example/d/sub/page",
        ]
        # link_no numbers SURVIVING links (mailto/javascript dropped)
        assert out["link_no"].to_pylist() == [0, 1, 2]
        assert out["is_internal"].to_pylist() == [True, False, True]
        assert out["src_host"].to_pylist() == ["h.example"] * 3

    def test_fragment_links_drop(self):
        fn = make_page_links_batch()
        out = fn(_pages([(
            "https://h.example/d/1",
            '<a href="#top">toc</a>'            # fragment-only: drop
            '<a href="/d/1#sec">self+frag</a>'  # resolves to this page: drop
            '<a href="/d/2#sec">other</a>',     # different page: keep
        )]))
        assert out["dst_url"].to_pylist() == ["https://h.example/d/2#sec"]
        assert out["link_no"].to_pylist() == [0]

    def test_null_payload_and_port_strip(self):
        fn = make_page_links_batch()
        t = pa.table({
            "url": pa.array(["https://a.example:8080/x", "https://b.example/"]),
            "html": pa.array([b'<a href="/p">z</a>', None], pa.binary()),
        })
        out = fn(t)
        # urlsplit().hostname strips the port on both sides of the compare
        assert out["src_host"].to_pylist() == ["a.example"]
        assert out["dst_host"].to_pylist() == ["a.example"]
        assert out["is_internal"].to_pylist() == [True]


class TestRollups:
    def _links(self):
        import ray.data as rd

        pages = _pages([
            ("https://a.example/1",
             '<a href="https://b.example/x">1</a><a href="https://b.example/y">2</a>'),
            ("https://a.example/2", '<a href="https://b.example/x">3</a>'),
            ("https://c.example/1", '<a href="https://b.example/z">4</a>'
                                    '<a href="/local">5</a>'),
        ])
        return page_out_links(rd.from_arrow(pages))

    def test_host_edges_counts(self):
        edges = {
            (r["src_host"], r["dst_host"]): r["n_links"]
            for r in host_edges(self._links()).take_all()
        }
        assert edges == {
            ("a.example", "b.example"): 3,
            ("c.example", "b.example"): 1,
            ("c.example", "c.example"): 1,
        }

    def test_host_in_links_summary(self):
        rows = {
            r["dst_host"]: (r["n_links"], r["n_src_hosts"])
            for r in host_in_links(host_edges(self._links())).take_all()
        }
        assert rows == {"b.example": (4, 2), "c.example": (1, 1)}


class TestAnchorTextAgg:
    def test_rollup_counts_and_sorted_distinct_anchors(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import anchor_text_agg

        pages = _pages([
            ("https://a.example/1",
             '<a href="https://t.example/x">zeta</a>'
             '<a href="https://t.example/x">alpha</a>'),
            ("https://b.example/2", '<a href="https://t.example/x">alpha</a>'),
            ("https://b.example/3", '<a href="https://t.example/y">solo</a>'),
        ])
        out = {
            r["dst_url"]: (r["n_links"], r["n_src_hosts"], r["anchors"])
            for r in anchor_text_agg(page_out_links(rd.from_arrow(pages))).take_all()
        }
        assert out["https://t.example/x"] == (3, 2, "alpha|zeta")
        assert out["https://t.example/y"] == (1, 1, "solo")

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import anchor_text_agg

        pages = _pages([
            (f"https://h{i%3}.example/{i}",
             f'<a href="https://t.example/p{i%4}">anchor {i%5}</a>')
            for i in range(40)
        ])
        a = sorted(
            map(tuple, (
                (r["dst_url"], r["n_links"], r["n_src_hosts"], r["anchors"])
                for r in anchor_text_agg(
                    page_out_links(rd.from_arrow(pages))).take_all()
            ))
        )
        b = sorted(
            map(tuple, (
                (r["dst_url"], r["n_links"], r["n_src_hosts"], r["anchors"])
                for r in anchor_text_agg(
                    page_out_links(rd.from_arrow(pages).repartition(7)),
                    num_partitions=5,
                ).take_all()
            ))
        )
        assert a == b


class TestHostPagerank:
    def test_mass_conserved_and_hub_ranks_highest(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import (
            host_edges, host_pagerank,
        )

        pages = _pages([
            (f"https://h{i % 4}.example/p{i}",
             '<a href="https://hub.example/x">h</a>')
            for i in range(20)
        ])
        pr = host_pagerank(host_edges(page_out_links(rd.from_arrow(pages))))
        assert abs(pr["rank"].sum() - 1.0) < 1e-9
        top = pr.sort_values("rank", ascending=False).iloc[0]
        assert top["host"] == "hub.example"

    def test_dangling_mass_redistributed(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import (
            host_edges, host_pagerank,
        )

        # a -> b, b has no out-links (dangling): mass must not leak
        pages = _pages([("https://a.example/1",
                         '<a href="https://b.example/x">x</a>')])
        pr = host_pagerank(host_edges(page_out_links(rd.from_arrow(pages))))
        assert abs(pr["rank"].sum() - 1.0) < 1e-9
        ranks = dict(zip(pr["host"], pr["rank"]))
        assert ranks["b.example"] > ranks["a.example"]

    def test_empty_graph(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import (
            host_edges, host_pagerank,
        )

        pages = _pages([("https://a.example/1", "<p>no links</p>")])
        pr = host_pagerank(host_edges(page_out_links(rd.from_arrow(pages))))
        assert len(pr) == 0


class TestHostPagerankSharded:
    def _graph(self, n_pages=60, hosts=7):
        # multi-host graph with a hub, cross-links and a dangling host so
        # the sharded path exercises every term of the update
        rows = []
        for i in range(n_pages):
            src = f"https://h{i % hosts}.example/p{i}"
            tgt1 = f"https://h{(i * 3 + 1) % hosts}.example/x"
            tgt2 = "https://hub.example/x"
            rows.append((src, f'<a href="{tgt1}">a</a><a href="{tgt2}">b</a>'))
        rows.append(("https://lonely.example/1",
                     '<a href="https://dangling.example/x">d</a>'))
        return _pages(rows)

    def test_bit_identical_vs_dense(self, ray_session):
        import numpy as np
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import (
            host_edges, host_pagerank, host_pagerank_sharded,
        )

        edges = host_edges(
            page_out_links(rd.from_arrow(self._graph()))
        ).materialize()
        dense = host_pagerank(edges)
        for n_shards in (2, 3, 5):
            sharded = host_pagerank_sharded(edges, n_shards=n_shards)
            assert sharded["host"].tolist() == dense["host"].tolist(), n_shards
            assert np.array_equal(
                sharded["rank"].to_numpy(), dense["rank"].to_numpy()
            ), n_shards

    def test_bit_identical_small_stream_batches(self, ray_session):
        """Stripe splitting across many tiny stream batches must preserve
        per-dst accumulation order (the bit-parity invariant)."""
        import numpy as np
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import (
            host_edges, host_pagerank, host_pagerank_sharded,
        )

        edges = host_edges(
            page_out_links(rd.from_arrow(self._graph(n_pages=40, hosts=5)))
        ).materialize()
        dense = host_pagerank(edges)
        sharded = host_pagerank_sharded(edges, n_shards=2, stream_batch_rows=3)
        assert sharded["host"].tolist() == dense["host"].tolist()
        assert np.array_equal(
            sharded["rank"].to_numpy(), dense["rank"].to_numpy()
        )

    def test_empty_graph(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import (
            host_edges, host_pagerank_sharded,
        )

        pages = _pages([("https://a.example/1", "<p>no links</p>")])
        pr = host_pagerank_sharded(
            host_edges(page_out_links(rd.from_arrow(pages))), n_shards=2
        )
        assert len(pr) == 0


class TestShardCpuSizing:
    def test_pool_never_oversubscribes(self):
        """Regression for the 0.05-floor hang: for ANY (total_cpus,
        n_shards) the whole pool's request must fit the cluster so every
        shard actor can schedule."""
        from deepseek_ocr_customvllm_ray.stages.links import _shard_cpus

        for total in (1, 2, 3, 4, 8, 16, 32, 256):
            for n in (1, 2, 4, 5, 20, 21, 81, 96, 500, 1000):
                if n * 0.0001 > total:
                    continue
                c = _shard_cpus(float(total), n)
                assert c >= 0.0001, (total, n, c)
                assert n * c <= total + 1e-9, (total, n, c)

    def test_large_cluster_gets_full_cores(self):
        from deepseek_ocr_customvllm_ray.stages.links import _shard_cpus

        assert _shard_cpus(64.0, 4) == 1.0

    def test_unschedulable_raises(self):
        import pytest

        from deepseek_ocr_customvllm_ray.stages.links import _shard_cpus

        with pytest.raises(ValueError):
            _shard_cpus(1.0, 20_000)


class TestHostComponents:
    def _run(self, ray_session, edges, parts=4):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.links import host_components

        t = pa.table({
            "src_host": pa.array([e[0] for e in edges], pa.string()),
            "dst_host": pa.array([e[1] for e in edges], pa.string()),
            "n_links": pa.array([1] * len(edges), pa.int64()),
        })
        out = host_components(
            rd.from_arrow(t).repartition(2), num_partitions=parts
        ).to_pandas()
        return dict(zip(out["host"], out["component"]))

    def test_two_components_and_self_loop(self, ray_session):
        got = self._run(ray_session, [
            ("a.com", "b.com"), ("b.com", "c.com"),   # chain a-b-c
            ("x.org", "y.org"),                       # pair
            ("solo.net", "solo.net"),                 # self-loop only
        ])
        assert got == {
            "a.com": "a.com", "b.com": "a.com", "c.com": "a.com",
            "x.org": "x.org", "y.org": "x.org",
            "solo.net": "solo.net",
        }

    def test_label_is_lexicographic_min(self, ray_session):
        # numeric-suffix hosts: "h10" < "h4" lexicographically
        got = self._run(ray_session, [("h4.x", "h10.x")])
        assert got == {"h4.x": "h10.x", "h10.x": "h10.x"}

    def test_matches_union_find(self, ray_session):
        rng = np.random.default_rng(17)
        hosts = [f"h{i:03d}.example" for i in range(60)]
        edges = [
            (hosts[int(rng.integers(0, 60))], hosts[int(rng.integers(0, 60))])
            for _ in range(55)
        ]
        got = self._run(ray_session, edges, parts=5)
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {h for e in edges for h in e}
        want = {h: find(h) for h in nodes}
        assert got == want
