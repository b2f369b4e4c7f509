"""Graph-level parity with the reference's RelationTripleSegmenter unit
suite (/root/reference/test/src/edu/stanford/nlp/naturalli/
RelationTripleSegmenterTest.java — each case cites its test method).
The reference feeds hand-built dependency graphs straight into the
segmenter; we feed the SAME graphs (CoNLL `idx word head rel [tag]
[ner]`, 1-based heads, 0 = root) into ``extract_sentence_triples``,
asserting the reference's expected triple is produced (containment — our
extractor also emits the reference's ForwardEntailer variants), and that
its negative cases produce nothing."""
import pytest

from corenlp_ray.stages.openie import extract_sentence_triples


def run(conll: str):
    words, tags, heads, labels, ners = [], [], [], [], []
    for line in conll.strip().splitlines():
        f = line.split()
        words.append(f[1])
        heads.append(int(f[2]) - 1)
        labels.append(f[3])
        tags.append(f[4] if len(f) > 4 else "NN")
        ners.append(f[5] if len(f) > 5 else "O")
    lemmas = [w.lower() for w in words]
    mentions = []
    i = 0
    while i < len(ners):
        if ners[i] != "O":
            j = i
            while j < len(ners) and ners[j] == ners[i]:
                j += 1
            mentions.append((i, j, ners[i]))
            i = j
        else:
            i += 1
    got = extract_sentence_triples(words, tags, lemmas, heads, labels,
                                   mentions)
    return {(s.lower(), p.lower(), o.lower()) for s, p, o, *_ in got}


# (name, conll, expected-in-set | None for must-be-empty)
CASES = [
    ("BlueCatsPlayWithYarn:187", """
1 blue 2 amod JJ
2 cats 3 nsubj NNS
3 play 0 root VBP
4 with 5 case IN
5 yarn 3 obl:with NN
""", ("blue cats", "play with", "yarn")),
    ("BlueCatsPlayQuietlyWithYarn:199", """
1 blue 2 amod JJ
2 cats 3 nsubj NNS
3 play 0 root VBP
4 quietly 3 advmod RB
5 with 6 case IN
6 yarn 3 obl:with NN
""", ("blue cats", "play quietly with", "yarn")),
    ("CatsHaveTails:212", """
1 cats 2 nsubj NNS
2 have 0 root VBP
3 tails 2 obj NNS
""", ("cats", "have", "tails")),
    ("FishLikeToSwim:232", """
1 fish 2 nsubj NN
2 like 0 root VBP
3 to 4 mark TO
4 swim 2 xcomp VB
""", ("fish", "like", "to swim")),
    ("MyCatsPlayWithYarn:254", """
1 my 2 nmod:poss PRP$
2 cats 3 nsubj NNS
3 play 0 root VBP
4 with 5 case IN
5 yarn 3 obl:with NN
""", ("my cats", "play with", "yarn")),
    ("CatsAreCute:266", """
1 cats 3 nsubj NNS
2 are 3 cop VBP
3 cute 0 root JJ
""", ("cats", "are", "cute")),
    ("IAmInFlorida:276", """
1 I 4 nsubj PRP
2 am 4 cop VBP
3 in 4 case IN
4 Florida 0 root NNP
""", ("i", "am in", "florida")),
    ("Wh:287", """
1 what 3 nsubj WP
2 is 3 cop VBZ
3 love 0 root NN
""", None),
    ("HeWasInaugurated:307", """
1 he 3 nsubj:pass PRP
2 was 3 aux:pass VBD
3 inaugurated 0 root VBN
4 as 5 case IN
5 president 3 obl:as NN
""", ("he", "was inaugurated as", "president")),
    ("PPAttachment:319", """
1 he 2 nsubj PRP
2 served 0 root VBD
3 as 4 case IN
4 president 2 obl:as NN
5 of 8 case IN
6 Harvard 8 compound NNP
7 Law 8 compound NNP
8 Review 4 nmod:of NNP
""", ("he", "served as", "president of harvard law review")),
    ("PPAttachmentTwo:334", """
1 he 4 nsubj PRP
2 was 4 cop VBD
3 community 4 compound NN
4 organizer 0 root NN
5 in 6 case IN
6 Chicago 4 nmod:in NNP
""", ("he", "was", "community organizer in chicago")),
    ("XComp:347", """
1 Obama 3 nsubj:pass NNP
2 was 3 aux:pass VBD
3 named 0 root VBN
4 2009 8 nummod CD
5 Nobel 8 compound NNP
6 Peace 8 compound NNP
7 Prize 8 compound NNP
8 Laureate 3 xcomp NNP
""", ("obama", "was named", "2009 nobel peace prize laureate")),
    ("PassiveNSubj:362", """
1 HRE 3 nsubj:pass NNP
2 was 3 aux:pass VBD
3 founded 0 root VBN
4 in 5 case IN
5 1991 3 obl:in CD
""", ("hre", "was founded in", "1991")),
    ("PassiveNSubj2:372", """
1 founded 0 root VBN
2 HRE 1 nsubj:pass NNP
3 in 4 case IN
4 2003 1 obl:in CD
""", ("hre", "founded in", "2003")),
    ("Possessive:383", """
1 Unicredit 5 nmod:poss NNP ORGANIZATION
2 's 1 case POS O
3 Bank 5 compound NNP ORGANIZATION
4 Austria 5 compound NNP ORGANIZATION
5 Creditanstalt 0 root NNP ORGANIZATION
""", ("unicredit", "has", "bank austria creditanstalt")),
    ("PossessiveNoNER:395", """
1 IBM 4 nmod:poss NNP ORGANIZATION
2 's 1 case POS O
3 research 4 compound NN O
4 group 0 root NN O
""", ("ibm", "has", "research group")),
    ("ApposInObject:417", """
1 Newspaper 2 nsubj NN
2 published 0 root VBD
3 in 4 case IN
4 Tucson 2 obl:in NNP
5 Arizona 4 appos NNP
""", ("newspaper", "published in", "arizona")),
    ("ApposAsSubj:429", """
1 Durin 0 root NNP
2 son 1 appos NN
3 of 4 case IN
4 Thorin 2 nmod:of NNP
""", ("durin", "son of", "thorin")),
    ("Reflexive:440", """
1 Tom 5 nsubj NNP
2 and 3 cc CC
3 Jerry 1 conj:and NNP
4 were 5 aux VBD
5 fighting 0 root VBG
""", ("tom", "fighting", "jerry")),
    ("PossessiveInEntity:466", """
1 Scania-Vabis 2 nsubj NNP
2 established 0 root VBD
3 its 6 nmod:poss PRP$
4 first 6 amod JJ
5 production 6 compound NN
6 plant 2 dobj NN
""", ("scania-vabis", "established", "its first production plant")),
    ("ObjInRelation:491", """
1 Scania-Vabis 2 nsubj NNP ORGANIZATION
2 established 0 root VB O
3 production 4 compound NN O
4 plant 2 obj NN O
5 outside 6 case IN O
6 Sodertalje 2 nmod:outside NN O
""", ("scania-vabis", "established production plant outside", "sodertalje")),
    ("ObjInRelation2:502", """
1 Hun 2 compound NNP PERSON
2 Sen 3 nsubj NNP PERSON
3 played 0 root VBD O
4 golf 3 obj NN O
5 with 6 case IN O
6 Shinawatra 3 nmod:with NNP PERSON
""", ("hun sen", "played golf with", "shinawatra")),
    ("ObjInRelationNeg:513", """
1 Hun 2 compound NNP PERSON
2 Sen 3 nsubj NNP PERSON
3 played 0 root VBD O
4 golf 3 obj NN O
5 Shinawatra 3 nmod:with NNP PERSON
6 Cambodia 3 dobj NNP LOCATION
""", None),
    ("VBG:525", """
1 foal 3 nsubj NN
2 be 3 aux VB
3 standing 0 root VBG
4 next 3 advmod RB
5 to 6 case TO
6 horse 3 nmod:to NN
""", ("foal", "be standing next to", "horse")),
    ("ThereAreIn:551", """
1 there 2 expl EX
2 are 0 root VBP
3 dogs 2 nsubj NN
4 in 5 case IN
5 heaven 3 nmod:in NN
""", ("dogs", "is in", "heaven")),
    ("ThereAreWith:563", """
1 there 2 expl EX
2 are 0 root VBP
3 cats 2 nsubj NN
4 with 5 case IN
5 tails 3 nmod:with NN
""", ("cats", "is with", "tails")),
    ("ThereAreVBing:575", """
1 there 2 expl EX
2 are 0 root VBP
3 dogs 2 nsubj NN
4 sitting 3 acl VBG
5 in 6 case IN
6 heaven 4 nmod:in NN
""", ("dogs", "sitting in", "heaven")),
    ("AdvObject:605", """
1 horses 3 nsubj NNS
2 are 3 cop VBP
3 grazing 0 root VBG
4 peacefully 3 advmod RB
""", ("horses", "are", "grazing peacefully")),
    ("AdvObjectPassive:617", """
1 things 3 nsubj:pass NNS
2 are 3 aux:pass VBP
3 arranged 0 root VBN
4 neatly 3 advmod RB
""", ("things", "are", "arranged neatly")),
    ("ObamaBornInRegression:628", """
1 Obama 2 nsubj NNP
2 Born 0 root VBN
3 in 4 case IN
4 Honolulu 2 nmod:in NNP
5 Hawaii 4 compound NNP
""", ("obama", "born in", "honolulu hawaii")),
    ("ObamaPresidentOfRegression:640", """
1 Obama 3 nsubj NNP
2 is 3 cop VBZ
3 president 0 root NN
4 of 5 case IN
5 US 3 nmod:of NNP
""", ("obama", "is president of", "us")),
    ("ObamaPresidentOfRegressionFull:652", """
1 Obama 6 nsubj NNP
2 is 6 cop VBZ
3 44th 6 amod JJ
4 and 5 cc CC
5 current 3 conj:and JJ
6 president 0 root NN
7 of 8 case IN
8 US 6 nmod:of NNP
""", ("obama", "is 44th and current president of", "us")),
    ("GeorgeBoydRegression:667", """
1 George 2 compound NNP
2 Boyd 4 nsubj NNP
3 has 4 aux VBZ
4 joined 0 root VBN
5 Nottingham 6 compound NNP
6 Forest 4 dobj NNP
""", ("george boyd", "has joined", "nottingham forest")),
    ("USPresidentObama1:680", """
1 United 5 compound NNP ORGANIZATION
2 States 5 compound NNP ORGANIZATION
3 president 5 compound NNP O
4 Barack 5 compound NNP PERSON
5 Obama 0 root NNP PERSON
""", ("barack obama", "is president of", "united states")),
    ("USAllyBritain:704", """
1 United 4 compound NNP LOCATION
2 States 4 compound NNP LOCATION
3 ally 4 compound NN O
4 Britain 0 root NNP LOCATION
""", ("britain", "is ally of", "united states")),
    ("USPresidentObamaAppos:715", """
1 United 2 compound NNP LOCATION
2 States 4 nmod:poss NNP LOCATION
3 's 2 case POS O
4 president 0 root NN O
5 Obama 2 appos NNP PERSON
""", ("obama", "is president of", "united states")),
    ("PresidentObama:745", """
1 President 2 compound POS TITLE
2 Obama 0 root NNP PERSON
""", ("obama", "is", "president")),
    ("ChrisManningOfStanford:771", """
1 Chris 2 compound NNP PERSON
2 Manning 0 root NNP PERSON
3 of 4 case IN O
4 Stanford 2 nmod:of NNP ORGANIZATION
""", ("chris manning", "is of", "stanford")),
    ("PPExtraction:806", """
1 Obama 0 root NNP PERSON
2 in 3 case IN O
3 Tucson 1 nmod:in NNP LOCATION
""", ("obama", "is in", "tucson")),
    ("PPExtraction2:815", """
1 Pietro 2 compound NNP PERSON
2 Badoglio 0 root NNP PERSON
3 in 5 case IN O
4 southern 5 amod JJ O
5 Italy 2 nmod:in NN LOCATION
""", ("pietro badoglio", "is in", "italy")),
    ("CommaDoesntOvergenerate:826", """
1 Honolulu 3 compound NNP LOCATION
2 , 1 punct . O
3 Hawaii 0 root NNP LOCATION
""", None),
    ("CompoundPossessive:843", """
1 IBM 4 nmod:poss NNP ORGANIZATION
2 's 1 case POS O
3 CEO 4 compound NNP TITLE
4 Rometty 0 root NNP ORGANIZATION
""", ("rometty", "is ceo of", "ibm")),
    ("ThrowAway:938", """
1 I 2 nsubj PRP
2 throw 0 root VB
3 away 2 compound:prt RP
4 my 5 nmod:poss PRP$
5 laptop 2 dobj NN
""", ("i", "throw away", "my laptop")),
    ("StateOfTheUnion:969", """
1 State 5 nsubj NNP
2 of 3 case IN
3 Union 1 nmod:of NNP
4 is 5 cop VBZ
5 tomorrow 0 root NN
""", None),
]


@pytest.mark.parametrize("name,conll,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_segmenter_case(name, conll, expected):
    got = run(conll)
    if expected is None:
        assert got == set(), f"expected no extraction, got {sorted(got)}"
    else:
        assert expected in got, f"missing {expected}; got {sorted(got)}"
