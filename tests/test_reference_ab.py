"""Direct A/B parity: run OUR pure functions and THE REFERENCE'S OWN CODE
(/root/reference/rag/nlp, imported with its asset-blocked deps stubbed)
side by side on generated inputs. This is the strongest parity evidence
available in-sandbox — not fixtures we wrote, but the reference executing.

The tiktoken stub routes BOTH sides through our deterministic token
counter (the one documented deviation), so token-budget boundaries agree
by construction and everything else must agree by implementation."""

import random
import sys
import types

import pytest


@pytest.fixture(scope="module")
def ref():
    from ragflow_spark.core.tokens import num_tokens_from_string as our_nts

    class _Enc:
        def encode(self, s):
            return list(range(our_nts(s)))

        def decode(self, toks):
            return ""

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    def _raise(exc):
        def f(s):
            raise exc(s)
        return f

    _mod("tiktoken", get_encoding=lambda name: _Enc())
    pil_img = _mod("PIL.Image", Image=type("Image", (), {}))
    _mod("PIL", Image=pil_img)
    _mod("roman_numbers", number=_raise(ValueError))
    w2n_sub = _mod("word2number.w2n", word_to_num=_raise(ValueError))
    _mod("word2number", w2n=w2n_sub)
    _mod("cn2an", cn2an=_raise(ValueError))
    fu = _mod("api.utils.file_utils",
              get_project_base_directory=lambda: "/tmp")
    au = _mod("api.utils", file_utils=fu)
    _mod("api", utils=au)
    _mod("rag.nlp.rag_tokenizer",
         tokenize=lambda s: s,
         fine_grained_tokenize=lambda s: s,
         is_chinese=lambda c: "一" <= c <= "鿿",
         tag=lambda t: "")

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    import rag.nlp as ref_nlp

    return ref_nlp


def _section_corpus(seed: int, n: int = 40) -> list[str]:
    rng = random.Random(seed)
    makers = [
        lambda i: f"第{'一二三四五六七八九十'[i % 10]}章 标题{i}",
        lambda i: f"{i + 1}. Numbered heading {i}",
        lambda i: f"{i + 1}.{(i % 3) + 1} Sub heading",
        lambda i: f"({i + 1}) bracket item",
        lambda i: f"plain prose sentence number {i} with several words.",
        lambda i: f"短句{i}。",
        lambda i: "key point: " + "word " * rng.randint(1, 20),
        lambda i: str(rng.randint(0, 999)),
        lambda i: "",
    ]
    return [rng.choice(makers)(i) for i in range(n)]


@pytest.mark.parametrize("seed", range(12))
def test_bullets_category_ab(ref, seed):
    from ragflow_spark.core.patterns import bullets_category

    secs = _section_corpus(seed)
    assert bullets_category(secs) == ref.bullets_category(secs)


@pytest.mark.parametrize("seed", range(12))
def test_not_bullet_ab(ref, seed):
    from ragflow_spark.core.patterns import not_bullet

    for s in _section_corpus(seed):
        assert not_bullet(s) == bool(ref.not_bullet(s)), repr(s)


@pytest.mark.parametrize("seed", range(8))
def test_qbullets_category_ab(ref, seed):
    from ragflow_spark.core.patterns import qbullets_category

    rng = random.Random(seed)
    secs = [
        rng.choice([
            f"{i + 1}. What is item {i}?",
            f"第{i + 1}问 这是什么？",
            f"QUESTION {i + 1}",
            f"plain answer text {i}",
        ])
        for i in range(20)
    ]
    assert qbullets_category(secs) == tuple(ref.qbullets_category(secs))


@pytest.mark.parametrize("seed", range(10))
def test_title_frequency_ab(ref, seed):
    from ragflow_spark.core.merges import title_frequency
    from ragflow_spark.core.patterns import bullets_category

    secs = [(t, "") for t in _section_corpus(seed) if t]
    bull = bullets_category([t for t, _ in secs])
    ours = title_frequency(bull, secs)
    theirs = ref.title_frequency(bull, secs)
    assert ours[0] == theirs[0]
    assert list(ours[1]) == list(theirs[1])


@pytest.mark.parametrize("seed", range(10))
def test_naive_merge_ab(ref, seed):
    from ragflow_spark.core.merges import naive_merge

    rng = random.Random(seed)
    secs = [
        (t, rng.choice(["", "@@1\t0.0\t1.0\t2.0\t3.0##"]))
        for t in _section_corpus(seed) if t
    ]
    for budget in (16, 128):
        ours = naive_merge(secs, budget, "\n。；！？")
        theirs = ref.naive_merge(secs, budget, "\n。；！？")
        assert ours == theirs, (budget, seed)


@pytest.mark.parametrize("seed", range(10))
def test_hierarchical_merge_ab(ref, seed):
    from ragflow_spark.core.merges import hierarchical_merge
    from ragflow_spark.core.patterns import bullets_category

    secs = [(t, "") for t in _section_corpus(seed) if t]
    bull = bullets_category([t for t, _ in secs])
    if bull < 0:
        pytest.skip("no bullet structure in this draw")
    ours = hierarchical_merge(bull, list(secs), 5)
    theirs = ref.hierarchical_merge(bull, list(secs), 5)
    assert [list(c) for c in ours] == [list(c) for c in theirs]


@pytest.mark.parametrize("seed", range(8))
def test_remove_contents_table_ab(ref, seed):
    from ragflow_spark.core.merges import remove_contents_table

    rng = random.Random(seed)
    secs = (
        [("intro text before contents", "")]
        + [("Contents", "")]
        + [(f"第{'一二三四五'[i]}章 ……… {i + 1}", "") for i in range(3)]
        + [("第一章 正文标题", "")]
        + [(t, "") for t in _section_corpus(seed, 10) if t]
    )
    a, b = [list(x) for x in secs], [list(x) for x in secs]
    a = [tuple(x) for x in a]
    b = [tuple(x) for x in b]
    ours, theirs = list(a), list(b)
    remove_contents_table(ours, eng=False)
    ref.remove_contents_table(theirs, eng=False)
    assert ours == theirs


@pytest.mark.parametrize("seed", range(8))
def test_make_colon_as_title_ab(ref, seed):
    from ragflow_spark.core.merges import make_colon_as_title

    rng = random.Random(seed)
    secs = [
        (rng.choice([
            "标题项：" + "内容句子。" * rng.randint(4, 12),
            "short: tail",
            "plain sentence with no colon at all " * 3,
        ]), "")
        for _ in range(12)
    ]
    ours, theirs = list(secs), list(secs)
    make_colon_as_title(ours)
    ref.make_colon_as_title(theirs)
    assert ours == theirs
