"""Golden/property tests for distributed BPE tokenizer training
(operators/bpe.py). The reference implementation below is the
textbook greedy algorithm (Sennrich et al. 2016) written
independently in pure Python — the learned merge sequence and the
segmentations must match exactly."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

END = "</w>"


def _ref_bpe(word_freqs: dict[str, int], n_merges: int, min_freq: int = 2):
    """Independent textbook reference: greedy merge of the most
    frequent adjacent pair, ties broken (freq desc, pair asc)."""
    vocab = {tuple(list(w) + [END]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_freq:
            break
        merges.append((a, b, freq))
        out = {}
        for syms, f in vocab.items():
            res = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + f
        vocab = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
]


def test_bpe_train_matches_reference(spark):
    from trendengine_spark.operators.bpe import bpe_train, word_vocab

    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "doc_id long, text string"
    )
    wf = {
        r["word"]: r["freq"] for r in word_vocab(docs).collect()
    }
    want_merges, want_vocab = _ref_bpe(wf, 10)
    got_merges, got_vocab_df = bpe_train(docs, 10)
    assert got_merges == want_merges
    got_vocab = {
        tuple(r["syms"]): r["freq"] for r in got_vocab_df.collect()
    }
    got_vocab_df.unpersist(blocking=False)
    # reference vocab keys are symbol tuples merged identically
    assert got_vocab == {k: v for k, v in want_vocab.items()}


def test_bpe_train_deterministic_across_partitioning(spark):
    from trendengine_spark.operators.bpe import bpe_train

    rows = [(i, s) for i, s in enumerate(CORPUS * 5)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    m1, v1 = bpe_train(a, 6)
    m2, v2 = bpe_train(a.repartition(13), 6)
    v1.unpersist(blocking=False)
    v2.unpersist(blocking=False)
    assert m1 == m2 and len(m1) == 6


def test_bpe_encode_words_applies_learned_merges(spark):
    from trendengine_spark.operators.bpe import bpe_encode_words, bpe_train

    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges, vocab_df = bpe_train(docs, 10)
    # training-set words must segment exactly as the trained vocab has
    # them (greedy inference in learned order == training result for
    # words seen in training)
    trained = {
        "".join(t for t in r["syms"]): r["syms"]
        for r in vocab_df.collect()
    }
    vocab_df.unpersist(blocking=False)
    words = spark.createDataFrame(
        [(w,) for w in ("low", "lower", "newest", "wider", "new")],
        "word string",
    )
    got = {
        r["word"]: r["bpe"]
        for r in bpe_encode_words(words, merges).collect()
    }
    for w, seg in got.items():
        assert "".join(seg) == w + END
        assert seg == trained[w + END], w
    # unseen word: falls back to finer segments, round-trips
    unseen = bpe_encode_words(
        spark.createDataFrame([("lowest",)], "word string"), merges
    ).collect()[0]["bpe"]
    assert "".join(unseen) == "lowest" + END


def test_bpe_min_pair_freq_stops_early(spark):
    from trendengine_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string"
    )
    merges, vocab = bpe_train(docs, 10)  # every pair is a hapax
    vocab.unpersist(blocking=False)
    assert merges == []


def test_bpe_pair_counts_weighted(spark):
    from trendengine_spark.operators.bpe import (
        _with_symbols,
        pair_counts,
        word_vocab,
    )

    docs = spark.createDataFrame(
        [(0, "aa aa ab")], "doc_id long, text string"
    )
    pc = {
        (r["left_sym"], r["right_sym"]): r["pair_freq"]
        for r in pair_counts(_with_symbols(word_vocab(docs))).collect()
    }
    assert pc[("a", "a")] == 2  # 'aa' twice, one adjacent pair each
    assert pc[("a", END)] == 2  # 'aa' end marker twice
    assert pc[("a", "b")] == 1
    assert pc[("b", END)] == 1


def test_bpe_encode_corpus_query_invariants(spark):
    """The declared corpus-encode query: no token lost through the
    vocab join, and the fertility ratio is a sane [1, max] value."""
    from tests.conftest import SF_SMOKE
    from trendengine_spark.queries import REGISTRY

    rows = REGISTRY["text_bpe_encode_corpus"].fn(spark, SF_SMOKE).collect()
    assert rows
    # every corpus token must survive the (word -> n_sub) join
    from trendengine_spark.operators.bpe import word_vocab
    from trendengine_spark.queries.base import t as _t

    docs = _t(spark, SF_SMOKE, "documents")
    total_tokens = (
        word_vocab(docs).agg({"freq": "sum"}).collect()[0][0]
    )
    assert sum(r["n_words"] for r in rows) == total_tokens
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"]  # >=1 subword/word
        assert 1.0 <= r["subwords_per_word"] <= 30.0


def test_merge_scan_jvm_equals_arrow_reference(spark):
    """_merge_pair_col (codegen fold) must be row-identical to the
    scalar Arrow-UDF scan on the adversarial shapes: KwKwK overlap
    runs, back-to-back hits, no-hit, and single-symbol arrays."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.bpe import (
        _merge_pair_col,
        _merge_pair_udf,
    )

    rows = [
        (["a", "a", "a"],),                 # KwKwK: -> [aa, a]
        (["a", "a", "a", "a"],),            # -> [aa, aa]
        (["a", "a", "a", "a", "a"],),       # -> [aa, aa, a]
        (["x", "a", "a", "y", "a", "a"],),  # interior + tail hits
        (["a", "b", "a"],),                 # no adjacent (a,a)
        (["a"],),                           # single symbol
        (["b", "a"],),                      # pair present reversed
    ]
    df = spark.createDataFrame(rows, "syms array<string>")
    got = df.select(
        _merge_pair_col("a", "a", "syms").alias("jvm"),
        _merge_pair_udf("a", "a")(F.col("syms")).alias("arrow"),
    ).collect()
    for r in got:
        assert r["jvm"] == r["arrow"]
    assert got[0]["jvm"] == ["aa", "a"]
    assert got[2]["jvm"] == ["aa", "aa", "a"]


def test_merge_scan_property_random_sequences(spark):
    """Property sweep: the JVM fold equals the scalar scan on random
    symbol sequences over a tiny alphabet (maximizes overlap runs)."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from trendengine_spark.operators.bpe import (
        _merge_pair_col,
        _merge_pair_udf,
    )

    rng = random.Random(1234)
    rows = [
        ([rng.choice("ab") for _ in range(rng.randint(1, 9))],)
        for _ in range(300)
    ] + [(list(p),) for k in (1, 2, 3, 4)
         for p in itertools.product("ab", repeat=k)]
    df = spark.createDataFrame(rows, "syms array<string>")
    for a, b in [("a", "a"), ("a", "b"), ("b", "a")]:
        got = df.select(
            _merge_pair_col(a, b, "syms").alias("jvm"),
            _merge_pair_udf(a, b)(F.col("syms")).alias("arrow"),
        ).collect()
        for r in got:
            assert r["jvm"] == r["arrow"], (a, b, r)
