"""Static English lexicons: closed-class POS entries, irregular verb/noun
tables, pronoun dictionaries (gender/number/animacy), gazetteers.

These are the engine's model resources — the analogue of the reference's
dictionary files (cf. /root/reference/src/edu/stanford/nlp/pipeline/
DefaultPaths.java:31-45 for the dcoref dictionaries). They are code, not
downloads: the sandbox has no network and the engine must be deterministic.
Loaded once per worker process at import (stateless stages) or once per
actor in ``__init__`` (stateful stages).
"""
from __future__ import annotations

# ------------------------------------------------------------ POS lexicon ----
# PTB tagset. Lowercased surface → tag. Closed classes + high-frequency words.

CLOSED_CLASS = {
    # determiners
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "these": "DT", "those": "DT", "some": "DT", "all": "DT", "every": "DT",
    "each": "DT", "no": "DT", "another": "DT", "any": "DT", "both": "DT",
    "either": "DT", "neither": "DT",
    # prepositions / subordinating conjunctions
    "of": "IN", "in": "IN", "for": "IN", "with": "IN", "on": "IN", "at": "IN",
    "by": "IN", "from": "IN", "about": "IN", "as": "IN", "into": "IN",
    "over": "IN", "after": "IN", "under": "IN", "between": "IN",
    "through": "IN", "during": "IN", "against": "IN", "among": "IN",
    "around": "IN", "before": "IN", "behind": "IN", "below": "IN",
    "beside": "IN", "near": "IN", "since": "IN", "until": "IN", "upon": "IN",
    "within": "IN", "without": "IN", "if": "IN", "because": "IN",
    "while": "IN", "although": "IN", "though": "IN", "whether": "IN",
    "per": "IN", "via": "IN", "despite": "IN", "toward": "IN", "towards": "IN",
    "like": "IN", "unlike": "IN",
    # coordinating conjunctions
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC", "yet": "CC",
    "plus": "CC",
    # modals
    "can": "MD", "could": "MD", "may": "MD", "might": "MD", "must": "MD",
    "shall": "MD", "should": "MD", "will": "MD", "would": "MD", "ca": "MD",
    "wo": "MD",
    # be / have / do
    "am": "VBP", "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD",
    "be": "VB", "been": "VBN", "being": "VBG",
    "has": "VBZ", "have": "VBP", "had": "VBD", "having": "VBG",
    "do": "VBP", "does": "VBZ", "did": "VBD", "done": "VBN", "doing": "VBG",
    # pronouns
    "i": "PRP", "you": "PRP", "he": "PRP", "she": "PRP", "it": "PRP",
    "we": "PRP", "they": "PRP", "me": "PRP", "him": "PRP", "her": "PRP$",
    "us": "PRP", "them": "PRP", "myself": "PRP", "yourself": "PRP",
    "himself": "PRP", "herself": "PRP", "itself": "PRP", "ourselves": "PRP",
    "themselves": "PRP", "mine": "PRP", "yours": "PRP", "hers": "PRP",
    "ours": "PRP", "theirs": "PRP",
    "my": "PRP$", "your": "PRP$", "his": "PRP$", "its": "PRP$", "our": "PRP$",
    "their": "PRP$",
    # wh-words
    "who": "WP", "whom": "WP", "whose": "WP$", "which": "WDT", "what": "WP",
    "when": "WRB", "where": "WRB", "why": "WRB", "how": "WRB",
    # particles / misc
    "not": "RB", "n't": "RB", "to": "TO", "there": "EX",
    "up": "RP", "down": "RP", "out": "RP", "off": "RP",
    # common adverbs
    "very": "RB", "also": "RB", "now": "RB", "then": "RB", "here": "RB",
    "just": "RB", "only": "RB", "even": "RB", "still": "RB", "again": "RB",
    "never": "RB", "always": "RB", "often": "RB", "already": "RB",
    "soon": "RB", "later": "RB", "once": "RB", "too": "RB", "well": "RB",
    "more": "RBR", "most": "RBS", "less": "RBR", "least": "RBS",
    "however": "RB", "yesterday": "NN", "today": "NN", "tomorrow": "NN",
    # comparatives (closed class; previously fell through to the NN
    # suffix default — caught by the sample_tagged.txt accuracy band)
    "than": "IN", "rather": "RB", "quite": "RB", "almost": "RB",
    "perhaps": "RB", "instead": "RB",
}

# high-frequency open-class entries (beats suffix heuristics)
OPEN_CLASS = {
    # verbs - base
    "say": "VB", "make": "VB", "go": "VB", "take": "VB", "come": "VB",
    "see": "VB", "know": "VB", "get": "VB", "give": "VB", "find": "VB",
    "think": "VB", "tell": "VB", "become": "VB", "leave": "VB", "work": "VB",
    "live": "VB", "study": "VB", "eat": "VB", "visit": "VB", "found": "VBD",
    "graduate": "VB", "marry": "VB", "die": "VB", "acquire": "VB",
    "jump": "VB", "run": "VB", "own": "VB", "lead": "VB", "move": "VB",
    "buy": "VB", "sell": "VB", "join": "VB", "serve": "VB", "hold": "VB",
    "write": "VB", "meet": "VB", "grow": "VB", "build": "VB", "win": "VB",
    # verbs - inflected irregulars
    "said": "VBD", "made": "VBD", "went": "VBD", "took": "VBD",
    "came": "VBD", "saw": "VBD", "knew": "VBD", "got": "VBD", "gave": "VBD",
    "thought": "VBD", "told": "VBD", "became": "VBD", "left": "VBD",
    "born": "VBN", "met": "VBD", "grew": "VBD", "built": "VBD", "won": "VBD",
    "wrote": "VBD", "led": "VBD", "bought": "VBD", "sold": "VBD",
    "ate": "VBD", "died": "VBD", "founded": "VBD", "acquired": "VBD",
    "married": "VBN", "headquartered": "VBN", "based": "VBN",
    "located": "VBN", "graduated": "VBD", "worked": "VBD", "lived": "VBD",
    "visited": "VBD", "studied": "VBD", "jumped": "VBD", "joined": "VBD",
    "works": "VBZ", "lives": "VBZ", "studies": "VBZ", "eats": "VBZ",
    "owns": "VBZ", "leads": "VBZ", "makes": "VBZ", "says": "VBZ",
    "employ": "VB", "employs": "VBZ", "dissolve": "VB",
    "disband": "VB", "liquidate": "VB", "convert": "VB",
    "sits": "VBZ", "practices": "VBZ", "embraces": "VBZ",
    # nouns
    "man": "NN", "woman": "NN", "time": "NN", "year": "NN", "people": "NNS",
    "way": "NN", "day": "NN", "thing": "NN", "child": "NN", "world": "NN",
    "company": "NN", "group": "NN", "part": "NN", "place": "NN", "case": "NN",
    "fox": "NN", "dog": "NN", "cat": "NN", "tail": "NN", "rabbit": "NN",
    "vegetable": "NN", "city": "NN", "officer": "NN", "executive": "NN",
    "chief": "NN", "president": "NN", "research": "NN", "wife": "NN",
    "husband": "NN", "subsidiary": "NN", "university": "NN", "school": "NN",
    "cats": "NNS", "tails": "NNS", "rabbits": "NNS", "vegetables": "NNS",
    "dogs": "NNS", "men": "NNS", "women": "NNS", "children": "NNS",
    "years": "NNS", "companies": "NNS", "groups": "NNS",
    "shares": "NNS", "prices": "NNS", "stocks": "NNS", "profits": "NNS",
    "sales": "NNS", "results": "NNS", "officials": "NNS",
    "investors": "NNS", "markets": "NNS", "analysts": "NNS",
    "robotics": "NN", "biology": "NN", "linguistics": "NN",
    "astronomy": "NN", "economics": "NN", "home": "NN", "bone": "NN",
    "bones": "NNS",
    # adjectives
    "new": "JJ", "good": "JJ", "high": "JJ", "old": "JJ", "great": "JJ",
    "big": "JJ", "small": "JJ", "large": "JJ", "young": "JJ", "long": "JJ",
    "little": "JJ", "own": "JJ", "other": "JJ", "last": "JJ", "next": "JJ",
    "early": "JJ", "late": "JJ", "quick": "JJ", "brown": "JJ", "lazy": "JJ",
    "fast": "JJ", "married": "VBN", "such": "JJ", "same": "JJ", "few": "JJ",
    "many": "JJ", "several": "JJ", "first": "JJ", "second": "JJ",
    "third": "JJ",
    # frequent adjectives the amod-deletion entailment variants depend on
    # (stripping applies only to amod-labeled tokens, so mistagging an
    # adjective as NN→compound blocks the shortened-triple family)
    "current": "JJ", "former": "JJ", "civil": "JJ", "general": "JJ",
    "constitutional": "JJ", "federal": "JJ", "national": "JJ",
    "local": "JJ", "social": "JJ", "final": "JJ", "central": "JJ",
    "royal": "JJ", "legal": "JJ", "chief": "JJ", "major": "JJ",
    "senior": "JJ", "junior": "JJ", "foreign": "JJ", "annual": "JJ",
    "due": "JJ", "free": "JJ", "full": "JJ", "recent": "JJ",
    "strong": "JJ", "weak": "JJ", "hard": "JJ", "real": "JJ",
    "true": "JJ", "false": "JJ", "blue": "JJ", "red": "JJ",
    "green": "JJ", "white": "JJ", "black": "JJ", "smart": "JJ",
    "top": "JJ", "main": "JJ", "key": "JJ", "total": "JJ",
    "prime": "JJ", "global": "JJ", "common": "JJ", "open": "JJ",
    "certain": "JJ", "intense": "JJ", "unsafe": "JJ", "safe": "JJ",
    "pink": "JJ", "yellow": "JJ", "purple": "JJ", "gray": "JJ",
    "grey": "JJ", "ready": "JJ", "wrong": "JJ", "cheap": "JJ",
    "rich": "JJ", "poor": "JJ", "huge": "JJ", "tiny": "JJ",
    "pretty": "JJ", "clean": "JJ", "warm": "JJ", "cold": "JJ",
    "hot": "JJ", "dark": "JJ", "bright": "JJ", "deep": "JJ",
    "wide": "JJ", "narrow": "JJ", "thick": "JJ", "sharp": "JJ",
    "soft": "JJ", "loud": "JJ", "quiet": "JJ", "busy": "JJ",
    "empty": "JJ", "angry": "JJ", "happy": "JJ", "sad": "JJ",
    "nice": "JJ", "sick": "JJ", "healthy": "JJ", "dead": "JJ",
    "wild": "JJ", "modern": "JJ", "ancient": "JJ", "simple": "JJ",
    "single": "JJ", "likely": "JJ", "easy": "JJ", "difficult": "JJ",
    "important": "JJ", "tall": "JJ", "short": "JJ", "tired": "JJ",
    # pronoun-like compounds PTB tags NN
    "nothing": "NN", "something": "NN", "anything": "NN",
    "everything": "NN", "someone": "NN", "anyone": "NN",
    "everyone": "NN", "nobody": "NN", "somebody": "NN",
    "everybody": "NN",
    "so": "RB",
    "fine": "JJ", "named": "VBN",
}

# capitalized nationality/language adjectives PTB tags JJ, not NNP
NATIONALITY_JJ = {
    "french", "british", "american", "german", "italian", "spanish",
    "chinese", "japanese", "russian", "english", "european", "african",
    "asian", "australian", "canadian", "mexican", "indian", "korean",
    "dutch", "greek", "turkish", "brazilian", "swedish", "norwegian",
    "danish", "polish", "irish", "scottish", "welsh", "arab", "arabic",
    "israeli", "egyptian", "iraqi", "iranian", "soviet",
}

POS_LEXICON = dict(OPEN_CLASS)
POS_LEXICON.update(CLOSED_CLASS)  # closed class wins on conflict

# --------------------------------------------------------- irregular verbs ----
# inflected form → lemma (used by the Morpha-analogue lemmatizer)
IRREGULAR_VERB_LEMMA = {
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "being": "be", "'s": "be", "'re": "be", "'m": "be",
    "has": "have", "had": "have", "having": "have", "'ve": "have",
    "does": "do", "did": "do", "done": "do",
    "went": "go", "gone": "go", "said": "say", "made": "make",
    "took": "take", "taken": "take", "came": "come", "saw": "see",
    "seen": "see", "knew": "know", "known": "know", "got": "get",
    "gotten": "get", "gave": "give", "given": "give", "found": "find",
    "thought": "think", "told": "tell", "became": "become", "left": "leave",
    "felt": "feel", "brought": "bring", "began": "begin", "begun": "begin",
    "kept": "keep", "held": "hold", "wrote": "write", "written": "write",
    "stood": "stand", "heard": "hear", "meant": "mean", "met": "meet",
    "ran": "run", "paid": "pay", "sat": "sit", "spoke": "speak",
    "spoken": "speak", "led": "lead", "grew": "grow", "grown": "grow",
    "lost": "lose", "fell": "fall", "fallen": "fall", "sent": "send",
    "built": "build", "understood": "understand", "drew": "draw",
    "drawn": "draw", "broke": "break", "broken": "break", "spent": "spend",
    "rose": "rise", "risen": "rise", "drove": "drive", "driven": "drive",
    "bought": "buy", "wore": "wear", "worn": "wear", "chose": "choose",
    "chosen": "choose", "ate": "eat", "eaten": "eat", "bore": "bear",
    "born": "bear", "borne": "bear", "sold": "sell", "taught": "teach",
    "caught": "catch", "fought": "fight", "won": "win", "sought": "seek",
    "lay": "lie", "lain": "lie", "slept": "sleep", "flew": "fly",
    "flown": "fly", "threw": "throw", "thrown": "throw", "wo": "will",
    "ca": "can", "n't": "not",
}

IRREGULAR_NOUN_LEMMA = {
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "geese": "goose", "people": "person",
    "lives": "life", "wives": "wife", "knives": "knife", "leaves": "leaf",
    "selves": "self", "halves": "half", "analyses": "analysis",
    "criteria": "criterion", "phenomena": "phenomenon", "data": "datum",
    "media": "medium", "indices": "index", "matrices": "matrix",
}

# words ending in -s that are NOT plural (keep as-is when tagged NN/NNP)
S_SINGULAR = {
    "news", "series", "physics", "economics", "mathematics",
    "linguistics", "robotics", "politics", "ethics", "athletics",
    "measles", "diabetes", "analysis", "basis", "crisis", "thesis", "bus",
    "gas", "glass", "class", "boss", "loss", "kiss", "address", "business",
    "press", "process", "access", "success", "chess", "lens", "canvas",
    "campus", "status", "virus", "census", "chaos", "cosmos",
    "asbestos", "esophagus", "alias", "atlas", "bias", "bonus",
    "focus", "circus", "consensus", "apparatus", "octopus", "iris",
    "tennis", "pelvis",
}

# ------------------------------------------------------ coref dictionaries ----
MALE_PRONOUNS = {"he", "him", "his", "himself"}
FEMALE_PRONOUNS = {"she", "her", "hers", "herself"}
NEUTRAL_PRONOUNS = {"it", "its", "itself"}
PLURAL_PRONOUNS = {"they", "them", "their", "theirs", "themselves"}
ALL_PRONOUNS = (MALE_PRONOUNS | FEMALE_PRONOUNS | NEUTRAL_PRONOUNS |
                PLURAL_PRONOUNS | {"i", "you", "we", "who"})

MALE_NAMES = {
    "john", "robert", "michael", "david", "james", "william", "richard",
    "joseph", "thomas", "charles", "daniel", "matthew", "mark", "paul",
    "george", "kenneth", "steven", "edward", "brian", "kevin", "peter",
    "bob", "bill", "jim", "tom", "mike", "dave", "dan", "steve", "ed",
}
FEMALE_NAMES = {
    "mary", "patricia", "linda", "barbara", "elizabeth", "jennifer",
    "maria", "susan", "margaret", "dorothy", "lisa", "nancy", "karen",
    "betty", "helen", "sandra", "donna", "carol", "ruth", "sharon",
    "michelle", "laura", "sarah", "kimberly", "deborah", "jessica",
    "anna", "emma", "olivia", "sophia", "kate", "jane", "alice", "sue",
    "heather", "amy", "angela", "melissa", "rebecca", "stephanie",
    "nicole", "katherine", "christine", "rachel", "catherine", "diana",
    "julia", "grace", "victoria", "natalie", "hannah", "emily",
}

# ------------------------------------------------------------- gazetteers ----
# TokensRegexNER-style mapping entries (surface → type, priority).
# cf. /root/reference/src/edu/stanford/nlp/pipeline/TokensRegexNERAnnotator.java:7-50
GAZETTEER = {
    # nationalities / misc
    "american": "MISC", "british": "MISC", "french": "MISC",
    "german": "MISC", "chinese": "MISC", "japanese": "MISC",
    "english": "MISC", "european": "MISC",
    # months are DATE handled by number rules; weekdays:
    "monday": "DATE", "tuesday": "DATE", "wednesday": "DATE",
    "thursday": "DATE", "friday": "DATE", "saturday": "DATE",
    "sunday": "DATE",
    # major intergovernmental bodies with no ORG-suffix token (the
    # reference carries these in its CRF gazetteer features)
    "united nations": "ORGANIZATION", "nato": "ORGANIZATION",
    "red cross": "ORGANIZATION", "opec": "ORGANIZATION",
    "interpol": "ORGANIZATION", "unesco": "ORGANIZATION",
    "unicef": "ORGANIZATION",
}

ORG_SUFFIXES = {
    "inc.", "inc", "corp.", "corp", "co.", "ltd.", "ltd", "llc", "plc",
    "group", "industries", "systems", "enterprises", "holdings",
    "technologies", "university", "institute", "association", "agency",
    "bank", "airlines", "motors", "labs", "laboratories", "partners",
    "company", "corporation", "foundation", "press", "times", "journal",
    "union", "committee", "council", "commission", "ministry", "party",
    "league", "federation", "department", "bureau", "fund", "trust",
}

PERSON_TITLES = {
    "mr.", "mrs.", "ms.", "dr.", "prof.", "sen.", "rep.", "gov.", "gen.",
    "col.", "capt.", "lt.", "sgt.", "president", "senator", "judge",
    "professor", "minister", "secretary", "chairman", "ceo", "director",
}

MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12, "jan.": 1, "feb.": 2, "mar.": 3,
    "apr.": 4, "jun.": 6, "jul.": 7, "aug.": 8, "sep.": 9, "sept.": 9,
    "oct.": 10, "nov.": 11, "dec.": 12,
}

NUMBER_WORDS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "sixty": 60,
    "seventy": 70, "eighty": 80, "ninety": 90, "hundred": 100,
    "thousand": 1000, "million": 10**6, "billion": 10**9,
    "trillion": 10**12,
}

ORDINAL_WORDS = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
}

# country-level names (drives the reference's type-split relation names:
# per:country_of_birth vs per:city_of_birth etc., KBPRelationExtractor
# COUNTRY/STATE_OR_PROVINCE/CITY NER subtypes)
COUNTRIES = {
    "america", "england", "france", "germany", "china", "japan", "india",
    "russia", "brazil", "canada", "mexico", "spain", "italy",
    "australia", "u.s.", "u.k.", "usa", "uk", "united states",
    "united kingdom", "u.s.a.", "us", "the united states",
    "the united states of america", "united states of america",
    "the united kingdom", "great britain", "the netherlands",
    "netherlands", "south korea", "north korea", "saudi arabia",
    "new zealand", "south africa",
}
US_STATES = {
    "california", "texas", "florida", "ohio", "virginia", "georgia",
    "michigan", "illinois", "arizona", "colorado", "oregon", "nevada",
    "alaska", "hawaii", "kansas", "iowa", "utah", "maine", "idaho",
    "montana", "wyoming", "vermont", "delaware", "maryland", "indiana",
    "missouri", "alabama", "louisiana", "kentucky", "tennessee",
    "oklahoma", "arkansas", "mississippi", "nebraska", "minnesota",
    "wisconsin", "pennsylvania", "connecticut", "massachusetts",
    "new jersey", "new hampshire", "new mexico", "north dakota",
    "south dakota", "north carolina", "south carolina", "west virginia",
    "rhode island",
}


def geo_subtype(name: str) -> str:
    """'country' | 'state' | 'city' for a LOCATION surface form."""
    lw = name.lower().strip()
    if lw in COUNTRIES:
        return "country"
    if lw in US_STATES:
        return "state"
    return "city"


LOCATIONS = {
    # countries / regions
    "america", "england", "france", "germany", "china", "japan", "india",
    "russia", "brazil", "canada", "mexico", "spain", "italy", "australia",
    "europe", "asia", "africa", "u.s.", "u.k.", "usa", "uk",
    "united states", "united kingdom", "new york", "los angeles",
    "san francisco", "chicago", "boston", "london", "paris", "berlin",
    "tokyo", "beijing", "moscow", "washington", "seattle", "austin",
    "houston", "dallas", "denver", "atlanta", "miami", "philadelphia",
    # the synthetic-corpus city bank (real US place names)
    "springfield", "riverside", "fairview", "georgetown", "madison",
    "clinton", "salem", "bristol", "arlington", "dover",
}

# stopwords for quality scoring / langid
EN_STOPWORDS = {
    "the", "of", "and", "a", "to", "in", "is", "was", "it", "for", "on",
    "are", "as", "with", "his", "her", "they", "at", "be", "this", "have",
    "from", "or", "had", "by", "not", "but", "some", "what", "there",
    "we", "can", "out", "were", "all", "your", "when", "up", "use", "an",
    "each", "she", "he", "which", "do", "their", "that", "will", "other",
    "about", "many", "then", "them", "these", "so", "would", "into",
    "has", "more", "its", "who", "you", "been", "no", "any",
}
