"""Unit tests for the vendored Porter2 (Snowball English) stemmer.

Expected values come from the published algorithm description
(https://snowballstem.org/algorithms/english/stemmer.html) — every pair
below is either an example given in the spec text or derived by hand from
the spec's rules.
"""

from ts_type_filter_ray.text.porter2 import stem


def test_short_words_unchanged():
    for w in ["a", "at", "by", "is", "me", "ox"]:
        assert stem(w) == w


def test_lowercases():
    assert stem("Running") == stem("running") == "run"
    assert stem("HAPPY") == "happi"


def test_exceptional_forms():
    pairs = {
        "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
        "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
        "early": "earli", "only": "onli", "singly": "singl",
    }
    for w, s in pairs.items():
        assert stem(w) == s, w
    for w in ["sky", "news", "howe", "atlas", "cosmos", "bias", "andes"]:
        assert stem(w) == w


def test_exceptions_after_1a():
    for w in ["inning", "outing", "canning", "herring", "earring",
              "proceed", "exceed", "succeed"]:
        assert stem(w) == w
    # plural forms reach the invariant via step 1a s-removal
    assert stem("innings") == "inning"
    assert stem("proceeds") == "proceed"


def test_step0_apostrophes():
    assert stem("dog's") == "dog"
    assert stem("dogs'") == "dog"
    # curly apostrophe normalized
    assert stem("dog’s") == "dog"


def test_step1a():
    # spec examples: ties->tie, cries->cri, gas->gas, this->this,
    # gaps->gap, kiwis->kiwi
    assert stem("ties") == "tie"
    assert stem("cries") == "cri"
    assert stem("gas") == "gas"
    assert stem("this") == "this"
    assert stem("gaps") == "gap"
    assert stem("kiwis") == "kiwi"
    assert stem("caresses") == "caress"
    assert stem("caress") == "caress"


def test_step1b():
    # spec: luxuriat -> luxuriate, hopp -> hop, hop -> hope
    assert stem("luxuriated") == stem("luxuriate")
    assert stem("hopping") == "hop"
    assert stem("hoping") == "hope"
    assert stem("hoped") == "hope"
    assert stem("agreed") == "agre"      # eed in R1 -> ee; step5 drops e
    assert stem("feed") == "feed"        # eed not in R1
    assert stem("motoring") == "motor"
    assert stem("sing") == "sing"        # no vowel before ing


def test_step1c():
    assert stem("cry") == "cri"
    assert stem("by") == "by"
    assert stem("say") == "say"
    assert stem("enemy") == "enemi"


def test_step2():
    assert stem("conditional") == "condit"     # tional->tion, ion dropped in step4
    assert stem("rational") == "ration"
    assert stem("valenci") == "valenc"
    assert stem("digitizer") == "digit"
    assert stem("nationalization") == "nation"
    assert stem("radically") == "radic"
    # "entli" is the longest match but lies outside R1 (r1=5, suffix at 3),
    # so per longest-match semantics nothing happens in step 2.
    assert stem("fluently") == "fluentli"


def test_step3_4():
    assert stem("duplicate") == "duplic"
    assert stem("hopefulness") == "hope"
    assert stem("goodness") == "good"
    # step 3 "ative" is not in R2 (r2=6, suffix at 4) so survives step 3;
    # step 4 removes "ive" (start 6 >= r2). Same path as formation->format.
    assert stem("formative") == "format"
    assert stem("formation") == "format"
    assert stem("adjustment") == "adjust"
    assert stem("adoption") == "adopt"
    assert stem("activate") == "activ"


def test_step5():
    assert stem("controll") == "control"
    assert stem("roll") == "roll"
    assert stem("cease") == "ceas"


def test_y_consonant_marking():
    # initial y is a consonant: "you" -> "you" (y not stemmed to i)
    assert stem("you") == "you"
    assert stem("yearly") == "year"
    # y after vowel is a consonant; y after consonant becomes i
    assert stem("happy") == "happi"
    assert stem("play") == "play"


def test_punctuation_tokens_pass_through():
    # the reference breaker keeps punctuation; the stemmer must not crash
    # on such tokens (inverted_index.py:26-33; documentation shows terms
    # like "by;" and "disarm'd.")
    assert isinstance(stem("foo():"), str)
    assert isinstance(stem("by;"), str)
    assert isinstance(stem("disarm'd."), str)
    assert stem("jalapeños") == stem("jalapeños")  # deterministic


def test_idempotent_on_common_vocab():
    # stemming is not idempotent in general but must be deterministic
    for w in ["import", "def", "self", "return", "classes", "functions",
              "running", "tested", "testing", "tests"]:
        assert stem(w) == stem(w)
    assert stem("classes") == "class"
    assert stem("functions") == stem("function")
    assert stem("tested") == stem("testing") == stem("tests") == "test"
