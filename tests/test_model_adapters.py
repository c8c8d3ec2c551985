"""Model-adapter contract tests: the langid / perplexity stages must
accept any externally-trained model object (fastText / KenLM shaped)
through the batch interfaces, with tokenization and batching handled by
the adapter — pinned here with fake "external model" doubles whose
outputs encode the token lists they were fed.
"""

import pytest

from hooqu_spark.pipeline.langid import (
    DEFAULT_LANGID,
    LangIdModel,
    langid_scores,
    score_tokens,
)
from hooqu_spark.pipeline.perplexity import (
    DEFAULT_LM,
    PerplexityModel,
    doc_log_ppl,
    perplexity_scores,
)


def make_fake_langid():
    """Double that proves the adapter feeds PER-DOC token lists in
    order: prediction encodes the token count, score the first token's
    length.  Defined inside a function so cloudpickle ships the class
    BY VALUE to executors (test modules are not importable there) —
    the same pattern a notebook-defined real-model wrapper follows."""

    class FakeLangId(LangIdModel):
        def predict_tokens(self, docs_tokens):
            return [
                (f"n{len(toks)}", float(len(toks[0]) if toks else -1))
                for toks in docs_tokens
            ]

    return FakeLangId()


def make_fake_perplexity():
    class FakePerplexity(PerplexityModel):
        def log_ppl_tokens(self, docs_tokens):
            return [float(len(toks)) * 0.5 for toks in docs_tokens]

    return FakePerplexity()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "x"),
        (2, ""),
        (3, None),
        (4, "the be to of and a in that have it"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLangIdAdapter:
    def test_fake_model_receives_correct_tokens(self, docs):
        out = {
            r["doc_id"]: (r["lang_pred"], r["lang_score"])
            for r in langid_scores(docs, model=make_fake_langid()).collect()
        }
        assert out[0] == ("n3", 5.0)   # 3 tokens, first is "alpha"
        assert out[1] == ("n1", 1.0)
        assert out[2] == ("n0", -1.0)  # empty -> no tokens
        assert out[3] == ("n0", -1.0)  # NULL text treated as empty
        assert out[4] == ("n10", 3.0)

    def test_default_model_matches_scorer_spec(self, docs):
        out = {
            r["doc_id"]: (r["lang_pred"], r["lang_score"])
            for r in langid_scores(docs, model=DEFAULT_LANGID).collect()
        }
        for r in docs.collect():
            want = score_tokens((r["text"] or "").split())
            assert out[r["doc_id"]][0] == want[0]
            assert out[r["doc_id"]][1] == pytest.approx(want[1])
        assert out[4][0] == "en"  # pure stopword text is English

    def test_input_columns_preserved(self, docs):
        out = langid_scores(docs, model=make_fake_langid())
        assert out.columns == ["doc_id", "text", "lang_pred", "lang_score"]
        assert out.count() == docs.count()


class TestPerplexityAdapter:
    def test_fake_model_output_plumbed(self, docs):
        out = {
            r["doc_id"]: r["log_ppl"]
            for r in perplexity_scores(docs, model=make_fake_perplexity()).collect()
        }
        assert out == {0: 1.5, 1: 0.5, 2: 0.0, 3: 0.0, 4: 5.0}

    def test_default_model_matches_spec(self, docs):
        out = {
            r["doc_id"]: r["log_ppl"]
            for r in perplexity_scores(docs, model=DEFAULT_LM).collect()
        }
        for r in docs.collect():
            assert out[r["doc_id"]] == pytest.approx(
                doc_log_ppl((r["text"] or "").split())
            )


# ---------------------------------------------------------------------------
# Guarded REAL-library integration (runs when fasttext / kenlm are
# importable — e.g. a production image; skipped in the sandbox).
# Mirrors the Pillow pattern in ops/multimodal.py: the adapter
# interface is proven against at least one real external model when
# available, deterministic fakes otherwise.
# ---------------------------------------------------------------------------


def test_fasttext_real_model_through_adapter(spark, tmp_path):
    """Train a tiny supervised fastText model in-test (no external
    data), wrap it as a LangIdModel, and run it through the
    mapInPandas adapter end-to-end."""
    fasttext = pytest.importorskip("fasttext")

    train = tmp_path / "ft_train.txt"
    train.write_text(
        "\n".join(
            ["__label__en the quick brown fox jumps over the lazy dog"] * 20
            + ["__label__de der schnelle braune fuchs springt sehr hoch"] * 20
        )
    )
    model_path = str(tmp_path / "ft.bin")
    fasttext.train_supervised(
        str(train), epoch=5, minCount=1, seed=7
    ).save_model(model_path)

    class FastTextLangId(LangIdModel):
        """Production-shaped wrapper: lazy-loads the binary executor-
        side (cloudpickle ships only the path), one predict() per
        batch."""

        def __init__(self, path):
            self._path = path
            self._m = None

        def predict_tokens(self, docs_tokens):
            if self._m is None:
                self._m = fasttext.load_model(self._path)
            texts = [" ".join(t) for t in docs_tokens]
            labels, scores = self._m.predict(texts)
            return [
                (ls[0].removeprefix("__label__") if ls else "und",
                 float(ss[0]) if len(ss) else 0.0)
                for ls, ss in zip(labels, scores)
            ]

    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "der schnelle braune fuchs")],
        "id long, text string",
    )
    rows = {
        r.id: (r.lang_pred, r.lang_score)
        for r in langid_scores(df, FastTextLangId(model_path)).collect()
    }
    assert set(rows) == {0, 1}
    for lang, score in rows.values():
        assert lang in {"en", "de"}
        assert 0.0 < score <= 1.0001


def test_kenlm_real_model_through_adapter(spark, tmp_path):
    """Load a hand-written minimal ARPA unigram model with real kenlm
    (no external data), wrap it as a PerplexityModel, and score
    through the mapInPandas adapter."""
    kenlm = pytest.importorskip("kenlm")

    arpa = tmp_path / "tiny.arpa"
    arpa.write_text(
        "\n\\data\\\n"
        "ngram 1=5\n"
        "\n\\1-grams:\n"
        "-1.0\t<unk>\n"
        "0.0\t<s>\n"
        "-0.3\t</s>\n"
        "-0.4\tcommon\n"
        "-1.5\trare\n"
        "\n\\end\\\n"
    )

    class KenLMPerplexity(PerplexityModel):
        def __init__(self, path):
            self._path = path
            self._m = None

        def log_ppl_tokens(self, docs_tokens):
            if self._m is None:
                self._m = kenlm.Model(self._path)
            out = []
            for toks in docs_tokens:
                if not toks:
                    out.append(0.0)
                    continue
                # mean negative log10 prob per token (KenLM scores
                # log10 of the whole sentence incl. </s>)
                s = self._m.score(" ".join(toks), bos=True, eos=True)
                out.append(-s / (len(toks) + 1))
            return out

    df = spark.createDataFrame(
        [(0, "common common common"), (1, "rare rare rare"), (2, "")],
        "id long, text string",
    )
    rows = {
        r.id: r.log_ppl for r in perplexity_scores(
            df, KenLMPerplexity(str(arpa))
        ).collect()
    }
    # the rare-token doc must score strictly worse (higher mean
    # surprisal) than the common-token doc; empty doc hits the 0 path
    assert rows[1] > rows[0] > 0.0
    assert rows[2] == 0.0
