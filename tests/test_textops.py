"""Text analysis, dedup, and ANN operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mkgmap_ray.stages.ann import lsh_bucketed_cosine_pairs, quantize, topk_dot
from mkgmap_ray.stages.dedup import (
    MinHasher,
    exact_dedup,
    minhash_candidates,
    ngram_jaccard,
    simhash64,
    simhash_candidates,
)
from mkgmap_ray.stages.text import TextStats, fingerprint64


class TestTextStats:
    def test_counts(self):
        ts = TextStats()
        df = ts(pd.DataFrame({"text": ["Hello, world! This is a test."]}))
        assert df["n_chars_calc"][0] == 29
        assert df["n_tokens"][0] == 6
        assert df["n_punct"][0] == 3  # comma, two terminal marks

    def test_langid(self):
        ts = TextStats()
        df = ts(
            pd.DataFrame(
                {
                    "text": [
                        "the cat and the dog went to the park for a walk",
                        "der Hund und die Katze sind nicht zu Hause auf dem Tisch",
                        "le chat et la souris sont dans les maisons pour une nuit",
                        "这是一个中文句子 测试 语言 检测",
                    ]
                }
            )
        )
        assert df["lang_pred"].tolist() == ["en", "de", "fr", "zh"]

    def test_fingerprint_deterministic_and_order_sensitive(self):
        assert fingerprint64("abc") == fingerprint64("abc")
        assert fingerprint64("abc") != fingerprint64("acb")

    def test_quality_range(self):
        ts = TextStats()
        df = ts(pd.DataFrame({"text": ["x", "the " * 100]}))
        assert ((df["quality"] >= 0) & (df["quality"] <= 1)).all()
        assert df["quality"][1] > df["quality"][0]


class TestMinHash:
    def test_identical_docs_full_match(self):
        mh = MinHasher()
        a = mh.signature("the quick brown fox jumps over the lazy dog" * 3)
        b = mh.signature("the quick brown fox jumps over the lazy dog" * 3)
        assert (a == b).all()

    def test_est_tracks_true_jaccard(self):
        mh = MinHasher(num_perm=128)
        t1 = "the quick brown fox jumps over the lazy dog " * 5
        t2 = t1.replace("quick", "slow")
        est = mh.jaccard_est(mh.signature(t1), mh.signature(t2))
        true = ngram_jaccard(t1, t2, 5)
        assert abs(est - true) < 0.2

    def test_disjoint_docs_low(self):
        mh = MinHasher()
        est = mh.jaccard_est(
            mh.signature("aaaa bbbb cccc dddd eeee"),
            mh.signature("zzzz yyyy xxxx wwww vvvv"),
        )
        assert est < 0.2


class TestSimHash:
    def test_similar_docs_close(self):
        a = simhash64("the quick brown fox jumps over the lazy dog extra words here".split())
        b = simhash64("the quick brown fox jumps over the lazy dog extra words there".split())
        ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        assert ham <= 12

    def test_identical_zero(self):
        toks = "alpha beta gamma delta".split()
        assert simhash64(toks) == simhash64(toks)


def docs_with_dups():
    base = [
        "the quick brown fox jumps over the lazy dog again and again %d" % i
        for i in range(20)
    ]
    texts = base + [base[3], base[7].replace("lazy", "lazy old"), "totally different content here"]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestDedupRay:
    def test_exact_dedup(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(docs_with_dups())
        out = exact_dedup(ds).to_pandas()
        # doc 20 is an exact dup of doc 3 → keeper 3 with n_dups 2
        row = out[out["keep_id"] == 3]
        assert len(row) == 1 and row["n_dups"].iloc[0] == 2
        assert 20 not in set(out["keep_id"])
        assert out["n_dups"].sum() == 23

    def test_minhash_finds_exact_and_near(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(docs_with_dups())
        pairs = minhash_candidates(ds, threshold=0.5).to_pandas()
        got = set(zip(pairs["a"], pairs["b"]))
        assert (3, 20) in got  # exact dup
        assert (7, 21) in got  # near dup

    def test_simhash_candidates(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(docs_with_dups())
        pairs = simhash_candidates(ds, max_hamming=4).to_pandas()
        got = set(zip(pairs["a"], pairs["b"]))
        assert (3, 20) in got


class TestAnn:
    def test_quantize_half_away(self):
        assert quantize(np.array([0.0004883, -0.0004883])).tolist() == [1, -1]

    def test_topk_dot_matches_brute(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(2)
        n, d = 500, 16
        emb = rng.standard_normal((n, d))
        table = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    emb.tolist(), pa.list_(pa.float32())
                ),
            }
        )
        ds = rd.from_arrow(table).repartition(4)
        q = emb[:3]
        res = topk_dot(ds, [0, 1, 2], q, k=5)
        # brute force in int space (float32 round-trip like the dataset)
        qi = quantize(q)
        ei = quantize(np.asarray(table["embedding"].combine_chunks().values)
                      .reshape(n, d))
        scores = ei @ qi.T
        for qid in range(3):
            order = np.lexsort((np.arange(n), -scores[:, qid]))[:5]
            got = res[res["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
            assert got == order.tolist()

    def test_lsh_cosine_pairs_find_duplicates(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        emb = rng.standard_normal((100, 16))
        emb[50] = emb[10] * 2.0  # same direction → cosine 1
        table = pa.table(
            {
                "vec_id": pa.array(range(100), pa.int64()),
                "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
            }
        )
        ds = rd.from_arrow(table)
        pairs = lsh_bucketed_cosine_pairs(ds, dim=16, threshold=0.99).to_pandas()
        assert (10, 50) in set(zip(pairs["a"], pairs["b"]))


class TestAnnIvf:
    def test_full_probe_equals_exact(self, ray_session):
        """The SQL face: probing every centroid list over the inverted
        layout reproduces exact brute-force top-k bit-for-bit."""
        from mkgmap_ray.pipelines.queries import (
            ANN_K,
            N_ANN_QUERIES,
            q_ann_ivf,
            q_ann_topk_dot,
        )

        out = q_ann_ivf("/root/testdata/sf0.001")
        exact = q_ann_topk_dot("/root/testdata/sf0.001")
        assert len(out) == N_ANN_QUERIES * ANN_K
        pd.testing.assert_frame_equal(
            out.sort_values(["query_id", "rank"]).reset_index(drop=True),
            exact.sort_values(["query_id", "rank"]).reset_index(drop=True),
        )

    def test_partial_probe_prunes_reads_with_recall(self, ray_session):
        """nprobe=4 of 16 must READ a strict subset of the data (the
        inverted property round 2 lacked) and still beat random recall."""
        from mkgmap_ray.pipelines.queries import (
            ANN_K,
            IVF_NPROBE,
            _ivf_setup,
            q_ann_topk_dot,
        )
        from mkgmap_ray.stages.ann import ivf_scan_rows, ivf_topk_indexed

        sf = "/root/testdata/sf0.001"
        q_ids, q_mat, centroids, index_dir = _ivf_setup(sf)
        out, scanned = ivf_topk_indexed(
            index_dir, q_ids, q_mat, centroids, k=ANN_K, nprobe=IVF_NPROBE
        )
        import glob

        total = ivf_scan_rows(glob.glob(f"{index_dir}/centroid=*"))
        assert 0 < scanned < total, (scanned, total)
        exact = q_ann_topk_dot(sf)
        ex = exact.groupby("query_id")["vec_id"].apply(set)
        recalls = [
            len(set(g["vec_id"]) & ex.get(qid, set())) / ANN_K * 100
            for qid, g in out.groupby("query_id")
        ]
        assert np.mean(recalls) >= 40, recalls


class TestSeaLookup:
    def test_states_partition_events(self, ray_session):
        import pyarrow.parquet as pq

        from mkgmap_ray.pipelines.queries import q_sea_lookup

        out = q_sea_lookup("/root/testdata/sf0.001")
        n_events = pq.ParquetFile(
            "/root/testdata/sf0.001/events.parquet"
        ).metadata.num_rows
        assert out["n"].sum() == n_events
        assert set(out["state"]) <= {0, 1, 2}


class TestCollation:
    def test_key_structure_and_strengths(self):
        from mkgmap_ray.stages.collate import sort_key

        # primary: case/accent-insensitive
        assert sort_key("abc")[:3] == sort_key("ABC")[:3]
        assert sort_key("été")[:3] == sort_key("ete")[:3]
        # full key: case decides at tertiary — lowercase first
        assert sort_key("abc") < sort_key("ABC")
        assert sort_key("abc") < sort_key("Abc")
        # accents decide at secondary, before case
        assert sort_key("ete") < sort_key("été") < sort_key("ETE") or \
            sort_key("ete") < sort_key("ETE")
        # primary order: space < digits < letters
        assert sort_key(" ") < sort_key("0") < sort_key("a")
        # different letters differ at primary regardless of case
        assert sort_key("B")[:2] < sort_key("c")[:2]

    def test_expansion(self):
        from mkgmap_ray.stages.collate import sort_key

        assert sort_key("a…b") == sort_key("a...b")
        assert sort_key("½") == sort_key("1/2")

    def test_ignorable_dropped(self):
        from mkgmap_ray.stages.collate import sort_key

        assert sort_key("a\x01b") == sort_key("ab")

    def test_hex_order_preserving(self):
        import pandas as pd

        from mkgmap_ray.stages.collate import sort_key, sort_key_hex

        names = ["forest", "FOREST", "Forest lace", "almond", "Almond",
                 "zebra stripe", " leading", "9 nine"]
        by_key = sorted(names, key=sort_key)
        hexes = sort_key_hex(pd.Series(names))
        by_hex = [n for _, n in sorted(zip(hexes, names))]
        assert by_key == by_hex
        # case-insensitive grouping with lowercase first
        assert by_key.index("forest") < by_key.index("FOREST")
        assert by_key.index("almond") < by_key.index("Almond")


class TestLabel8:
    def test_roundtrip_and_terminator(self):
        from mkgmap_ray.stages.labelenc import decode8, encode8, encode_utf8

        for t in ["Main Street 42", "", "ASCII only"]:
            e = encode8(t)
            assert e.endswith(b"\x00")
            assert decode8(e) == t
            assert encode_utf8(t) == t.encode() + b"\x00"

    def test_latin1_and_transliteration(self):
        from mkgmap_ray.stages.labelenc import encode8, transliterate_ascii

        assert encode8("café")[:-1] == "café".encode("latin-1")
        assert transliterate_ascii("Ærø straße") == "AEroe strasse"
        # ascii target transliterates; unknown non-latin becomes ?
        assert encode8("café", codepage="ascii") == b"cafe\x00"
        assert encode8("日", codepage="ascii") == b"?\x00"

    def test_upper_flag(self):
        from mkgmap_ray.stages.labelenc import encode8

        assert encode8("abc", upper=True) == b"ABC\x00"


class TestLocator:
    def test_variants_normalize(self):
        from mkgmap_ray.stages.locator import Locator

        loc = Locator(["FRANCE", "UNITED STATES"])
        for v in ("FRANCE", "france", "France", "The France",
                  " the france "):
            assert loc.normalize(v) == "FRANCE"
        assert loc.normalize("narnia") is None

    def test_series_form(self):
        import pandas as pd

        from mkgmap_ray.stages.locator import Locator

        loc = Locator(["KENYA"])
        out = loc.normalize_series(
            pd.Series(["kenya", "The Kenya", "mars"], dtype="string")
        )
        assert out.tolist()[:2] == ["KENYA", "KENYA"]
        assert pd.isna(out[2])


class TestPrefixSuffix:
    def test_prefix_blank_becomes_1e(self):
        from mkgmap_ray.stages.labelenc import prefix_suffix_filter

        out = prefix_suffix_filter("Rue de la Paix", "FRA")
        assert out == "Rue de la\x1ePaix"

    def test_suffix_blank_becomes_1f(self):
        from mkgmap_ray.stages.labelenc import prefix_suffix_filter

        out = prefix_suffix_filter("Abbey Road", "GBR")
        assert out == "Abbey\x1fRoad"

    def test_glued_suffix_gets_1c(self):
        from mkgmap_ray.stages.labelenc import prefix_suffix_filter

        out = prefix_suffix_filter("Hauptstraße", "DEU")
        assert out == "Haupt\x1cstraße"

    def test_case_insensitive_and_first_wins(self):
        from mkgmap_ray.stages.labelenc import prefix_suffix_filter

        out = prefix_suffix_filter("rue de la paix", "FRA")
        # the reference splices the LIST's canonical casing in
        # (label = prefix.substring(...) + 0x1e + rest)
        assert out == "Rue de la\x1epaix"

    def test_no_country_or_no_match(self):
        from mkgmap_ray.stages.labelenc import prefix_suffix_filter

        assert prefix_suffix_filter("Main Plaza", "USA") == "Main Plaza"
        assert prefix_suffix_filter("Rue X", "") == "Rue X"


class TestDedupEdgeCases:
    def test_trailing_empty_doc_does_not_corrupt_simhash(self):
        """Round-2 ADVICE: a whitespace-only doc after a non-empty doc in
        the same batch clamped the reduceat boundary and stole the final
        token's votes."""
        from mkgmap_ray.stages.dedup import simhash64_batch

        a = int(simhash64_batch(["alpha beta gamma"])[0])
        b = simhash64_batch(["alpha beta gamma", "   "])
        c = simhash64_batch(["", "alpha beta gamma", " ", "x y z", ""])
        assert int(b[0]) == a
        assert int(c[1]) == a
        assert int(c[3]) == int(simhash64_batch(["x y z"])[0])
        assert int(b[1]) == int(simhash64_batch([""])[0])

    def test_all_empty_minhash_batch(self):
        """Round-2 ADVICE: an all-empty batch crashed _shingle_hash_batch
        with IndexError on the zero-length byte buffer."""
        mh = MinHasher()
        sig = mh.signatures(["", "", ""])
        assert sig.shape == (3, mh.num_perm)
        assert (sig[0] == sig[1]).all() and (sig[1] == sig[2]).all()
        # and mixed empty/non-empty stays consistent with solo hashing
        mixed = mh.signatures(["", "hello world shingles", ""])
        solo = mh.signature("hello world shingles")
        assert (mixed[1] == solo).all()

    def test_bucket_pairs_runs_and_cap(self):
        from mkgmap_ray.stages.dedup import _bucket_pairs

        gid = np.array([0, 0, 1, 2, 2, 2, 3])
        iu, ju = _bucket_pairs(gid, 512)
        assert set(zip(iu.tolist(), ju.tolist())) == {
            (0, 1), (3, 4), (3, 5), (4, 5)
        }
        iu, ju = _bucket_pairs(gid, 2)  # cap trims the 3-member bucket
        assert set(zip(iu.tolist(), ju.tolist())) == {(0, 1), (3, 4)}
        iu, ju = _bucket_pairs(np.array([], dtype=np.int64), 4)
        assert len(iu) == 0 and len(ju) == 0

    def test_candidate_pairs_exactly_once(self, ray_session):
        """Near-dup pairs co-bucket in MANY bands; the output must still
        contain each (a, b) exactly once (global pair dedupe)."""
        import ray.data as rd

        ds = rd.from_arrow(docs_with_dups())
        for pairs in (
            minhash_candidates(ds, threshold=0.5).to_pandas(),
            simhash_candidates(ds, max_hamming=4).to_pandas(),
        ):
            keys = list(zip(pairs["a"], pairs["b"]))
            assert len(keys) == len(set(keys))
            assert (pairs["a"] < pairs["b"]).all()


class TestNgramJaccard:
    @staticmethod
    def brute_pairs(texts, k=4, min_ppm=500_000):
        """Set-based oracle: distinct word-k-gram tuples, exact Jaccard."""
        sets = []
        for t in texts:
            w = t.split()
            sets.append({tuple(w[i : i + k]) for i in range(len(w) - k + 1)})
        out = {}
        for a in range(len(sets)):
            for b in range(a + 1, len(sets)):
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter * 1_000_000 // union >= min_ppm:
                    out[(a, b)] = (inter, inter * 1_000_000 // union)
        return out

    def test_matches_set_oracle(self, ray_session):
        import ray.data as rd

        from mkgmap_ray.stages.dedup import ngram_jaccard_pairs

        t = docs_with_dups()
        got = ngram_jaccard_pairs(rd.from_arrow(t), min_ppm=500_000)
        exp = self.brute_pairs([s.as_py() for s in t["text"]])
        assert {
            (a, b): (i, j)
            for a, b, i, j in zip(got["a"], got["b"], got["inter"],
                                  got["jacc_ppm"])
        } == exp
        assert (3, 20) in exp  # the exact dup survives with jacc 1.0

    def test_short_and_empty_docs(self, ray_session):
        import ray.data as rd

        from mkgmap_ray.stages.dedup import ngram_jaccard_pairs

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["", "one two three", "a b c d e f", "a b c d e f"]
                ),
            }
        )
        got = ngram_jaccard_pairs(rd.from_arrow(t))
        assert list(zip(got["a"], got["b"])) == [(2, 3)]
        assert got["jacc_ppm"].iloc[0] == 1_000_000


class TestCosineNearDup:
    def test_matches_float_brute(self, ray_session):
        import ray.data as rd

        from mkgmap_ray.stages.ann import cosine_neardup_pairs

        rng = np.random.default_rng(7)
        base = rng.normal(size=(30, 16))
        # plant near-dups: rows 30..32 are jittered copies of 0..2
        mat = np.vstack([base, base[:3] + rng.normal(scale=0.02, size=(3, 16))])
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        ids = np.arange(len(mat), dtype=np.int64)
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )
        got = cosine_neardup_pairs(
            rd.from_arrow(t), ids, mat, thr2_bp=8100  # cos >= 0.9
        )
        pairs = set(zip(got["a"], got["b"]))
        assert {(0, 30), (1, 31), (2, 32)} <= pairs
        # integer test tracks float cosine away from the boundary
        q = quantize(mat)
        n2 = (q * q).sum(1)
        for a, b in pairs:
            d = int(q[a] @ q[b])
            assert d > 0 and d * d * 10_000 >= 8100 * int(n2[a]) * int(n2[b])

    def test_norm_guard(self):
        from mkgmap_ray.stages.ann import CosinePairsPartial

        big = np.full((2, 4), 4e4)
        with pytest.raises(ValueError):
            CosinePairsPartial((np.arange(2), big))


class TestBpeTokens:
    def test_counts_match_naive(self):
        import re as _re

        from mkgmap_ray.stages.text import BPE_PRETOKEN, BpeTokens

        texts = [
            "hello world, it's 2026!",
            "  leading spaces\tand\ttabs ",
            "",
            "supercalifragilistic 12345 --- x",
        ]
        b = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = BpeTokens()(b)
        pat = _re.compile(BPE_PRETOKEN)
        for i, t in enumerate(texts):
            toks = pat.findall(t)
            assert out["n_pretokens"].iloc[i] == len(toks)
            assert out["n_pieces"].iloc[i] == sum(
                (len(w) + 3) // 4 for w in toks
            )
            assert out["n_ws_tokens"].iloc[i] == len(t.split())
