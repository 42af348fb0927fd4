"""Porter stemmer golden tests against the published algorithm's known
input/output pairs (tartarus distribution semantics — the variant the
reference vendors, PorterStemmer.java:84-627)."""

from __future__ import annotations

from information_retrieval_system_spark.analysis.porter import porter_stem, stem

# (word, expected) — canonical pairs from the published voc/output lists of
# the tartarus distribution, incl. the two exercised by the reference's own
# smoke main (Stemmer.java:90-95).
GOLDEN = [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"),
    ("sky", "sky"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("conformabli", "conform"),
    ("radicalli", "radic"),
    ("differentli", "differ"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # reference smoke pairs (Stemmer.java:90-95)
    ("ending", "end"),
    ("publications", "public"),
    # length<=2 guard (stem():612-622)
    ("is", "is"),
    ("a", "a"),
    ("by", "by"),
    # logi -> log (tartarus-updated variant)
    ("archaeologi", "archaeolog"),
    ("geologi", "geologi"),  # stem "geo" has m=0 -> rule 3 does not fire
]


def test_golden_pairs():
    bad = [(w, e, porter_stem(w)) for w, e in GOLDEN if porter_stem(w) != e]
    assert not bad, f"mismatches: {bad}"


def test_dispatch_greek_and_nonascii_unstemmed():
    assert stem("και") == "και"
    assert stem("Δένδρο") == "δένδρο"  # lowercased, not stemmed
    assert stem("ending") == "end"
    assert stem("  Ending  ") == "end"
    assert stem("") == ""
    assert stem("münchen") == "münchen"  # non-ASCII initial -> unchanged


def test_idempotent_on_short():
    for w in ["a", "ab", "io", "x"]:
        assert porter_stem(w) == w
