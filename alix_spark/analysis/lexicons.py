"""French lexical resources for the analysis chain.

The reference ships these as CSV resources loaded by
``analysis/.../LexiconHelper.java`` (formats in SURVEY.md §1.4); its main
lemma dictionary ``word.csv`` is absent from the snapshot
(`.MISSING_LARGE_BLOBS:6`), so this engine carries its own compact,
hand-authored lexicons with the same *shapes*:

- clitic tables    (reference: analysis/.../fr/FrenchCliticSplitFilter.java:103-185)
- normalization    (reference: fr/.../norm-variants.csv format ACCEPTED,CANONICAL)
- lemma dictionary ((form, pos) → lemma with POS-agnostic fallback,
                    reference: analysis/.../LemmaFilter.java:205-211)
- MWE table        (reference: fr/.../mwe-words.csv format GRAPH,NORM,TAG)
- stopwords        (reference: common/.../fr/stopwords.csv — surface-form stops)
- brevidots        (reference: fr/.../brevidots.csv — abbreviations ending in dot)
- ucwords          (reference: fr/.../ucwords.csv — protected all-caps words)

All content here is authored for this engine (public French grammar
facts); nothing is copied from the reference resources.
"""

from __future__ import annotations

# --------------------------------------------------------------- clitics

# Lexicalized forms kept unsplit (reference FrenchCliticSplitFilter.java:103-124).
CLITIC_KEEP = frozenset(
    {
        "aujourd'hui", "d'abord", "d'accord", "d'ailleurs", "d'après",
        "d'autant", "d'emblée", "d'œuvre", "d'oeuvre", "quelqu'un",
        "quelqu'une", "n'importe", "presqu'île", "prud'homme",
        "c'est-à-dire", "entr'acte", "grand'chose", "aujourd'hui,",
    }
)

# apostrophe-prefix → expanded form (reference :127-144).  `l'` stays `l'`
# in the reference table; we keep that behavior.
CLITIC_PREFIX = {
    "c'": "ce", "d'": "de", "j'": "je", "jusqu'": "jusque", "l'": "l'",
    "lorsqu'": "lorsque", "m'": "me", "n'": "ne", "presqu'": "presque",
    "puisqu'": "puisque", "qu'": "que", "quoiqu'": "quoique", "s'": "se",
    "t'": "te",
}

# hyphen-suffix enclitics; value None = token dropped (reference :158-185:
# -ci, -là, -t are dropped, the rest become standalone pronouns).
CLITIC_SUFFIX: dict[str, str | None] = {
    "-ce": "ce", "-ci": None, "-elle": "elle", "-elles": "elles",
    "-en": "en", "-eux": "eux", "-il": "il", "-ils": "ils", "-je": "je",
    "-la": "la", "-là": None, "-le": "le", "-les": "les", "-leur": "leur",
    "-lui": "lui", "-me": "me", "-moi": "moi", "-nous": "nous", "-on": "on",
    "-t": None, "-te": "te", "-toi": "toi", "-tu": "tu", "-vous": "vous",
    "-y": "y",
}
MAX_SPLITS = 8  # reference :80

# ------------------------------------------------------- normalization map

# ACCEPTED → CANONICAL whole-token rewrites (reference ReplaceFilter.java:77-131).
NORM = {
    "&c.": "etc.",
    "sçavoir": "savoir",
    "poëte": "poète",
    "poëme": "poème",
    "très-grand": "très grand",
    "long-temps": "longtemps",
}

# --------------------------------------------------------------- POS tags

# UD tags as strings; structural punct uses the reference's extra codes
# (reference common/.../Upos.java:30-177).
PUNCT_SECTION = "PUNCTsection"
PUNCT_PARA = "PUNCTpara"
PUNCT_SENT = "PUNCTsent"
PUNCT_CLAUSE = "PUNCTclause"

# function-word POS (used by the deterministic tagger; the reference uses
# an OpenNLP maxent model — SURVEY §7 option (iii) substitutes this
# lexicon tagger and pins goldens to it)
POS = {}
for _w in ("le", "la", "les", "l'", "un", "une", "des", "du", "ce", "cette",
           "ces", "son", "sa", "ses", "leur", "leurs", "notre", "votre"):
    POS[_w] = "DET"
for _w in ("de", "à", "dans", "sur", "sous", "avec", "sans", "pour", "par",
           "en", "vers", "chez", "jusque", "au", "aux"):
    POS[_w] = "ADP"
for _w in ("et", "ou", "mais", "donc", "or", "ni", "car"):
    POS[_w] = "CCONJ"
for _w in ("que", "quand", "si", "comme", "lorsque", "puisque", "quoique"):
    POS[_w] = "SCONJ"
for _w in ("je", "tu", "il", "elle", "on", "nous", "vous", "ils", "elles",
           "me", "te", "se", "moi", "toi", "lui", "eux", "y", "en", "qui"):
    POS[_w] = "PRON"
for _w in ("est", "sont", "était", "fut", "sera", "a", "ont", "avait",
           "suis", "es", "sommes", "êtes", "ai", "as", "avons", "avez"):
    POS[_w] = "AUX"
for _w in ("ne", "pas", "plus", "très", "bien", "trop", "peu", "aussi",
           "alors", "ici", "là", "toujours", "jamais", "encore"):
    POS[_w] = "ADV"

# ---------------------------------------------------------------- lemmas

# (form, pos) → lemma;  POS-agnostic fallback keyed by form alone
# (reference LemmaFilter.java:205-211: POS-specific first, then agnostic).
LEMMA_POS: dict[tuple[str, str], str] = {
    ("est", "AUX"): "être", ("sont", "AUX"): "être", ("était", "AUX"): "être",
    ("fut", "AUX"): "être", ("sera", "AUX"): "être", ("suis", "AUX"): "être",
    ("a", "AUX"): "avoir", ("ont", "AUX"): "avoir", ("avait", "AUX"): "avoir",
    ("ai", "AUX"): "avoir", ("avons", "AUX"): "avoir",
    # POS-disambiguated homographs (reference test LemmaFilterTest.java:61-113)
    ("la", "DET"): "le", ("la", "PRON"): "le",
    ("les", "DET"): "le", ("des", "DET"): "de",
}
LEMMA: dict[str, str] = {
    # determiners / contractions
    "la": "le", "les": "le", "l'": "le", "une": "un", "des": "un",
    "du": "de", "au": "à", "aux": "à", "cette": "ce", "ces": "ce",
    "sa": "son", "ses": "son", "leurs": "leur",
    # verbs → infinitive
    "parle": "parler", "voit": "voir", "fait": "faire", "dit": "dire",
    "pense": "penser", "croit": "croire", "donne": "donner",
    "prend": "prendre", "vient": "venir", "va": "aller", "sait": "savoir",
    "peut": "pouvoir", "veut": "vouloir", "doit": "devoir",
    "trouve": "trouver", "cherche": "chercher", "montre": "montrer",
    "écrit": "écrire", "lit": "lire", "aime": "aimer",
    "regarde": "regarder", "écoute": "écouter", "comprend": "comprendre",
    "est": "être", "sont": "être", "était": "être", "fut": "être",
    "sera": "être", "a": "avoir", "ont": "avoir", "avait": "avoir",
    # nouns plural → singular
    "maisons": "maison", "villes": "ville", "hommes": "homme",
    "femmes": "femme", "enfants": "enfant", "livres": "livre",
    "histoires": "histoire", "jours": "jour", "nuits": "nuit",
    "mondes": "monde", "pays": "pays", "guerres": "guerre",
    "idées": "idée", "œuvres": "œuvre", "états": "état",
    "églises": "église", "rois": "roi", "peuples": "peuple",
    "siècles": "siècle", "arts": "art", "sciences": "science",
    "esprits": "esprit", "cœurs": "cœur", "âmes": "âme",
    "libertés": "liberté", "travaux": "travail", "sociétés": "société",
    "langues": "langue",
    # adjectives → masculine singular
    "grande": "grand", "grands": "grand", "grandes": "grand",
    "petite": "petit", "petits": "petit", "petites": "petit",
    "belle": "beau", "beaux": "beau", "belles": "beau",
    "jeunes": "jeune", "vieille": "vieux", "vieilles": "vieux",
    "nouvelle": "nouveau", "nouveaux": "nouveau", "nouvelles": "nouveau",
    "ancienne": "ancien", "anciens": "ancien", "anciennes": "ancien",
    "première": "premier", "premiers": "premier", "premières": "premier",
    "dernière": "dernier", "derniers": "dernier", "dernières": "dernier",
    "seule": "seul", "seuls": "seul", "seules": "seul",
    "mêmes": "même", "autres": "autre", "vraie": "vrai", "vrais": "vrai",
    "fausse": "faux", "noire": "noir", "noirs": "noir",
    "blanche": "blanc", "blancs": "blanc", "rouges": "rouge",
    "profonde": "profond", "profonds": "profond",
    "claire": "clair", "clairs": "clair", "obscure": "obscur",
    "obscurs": "obscur", "forte": "fort", "forts": "fort",
}

# proper nouns protected from lowercase-retry (reference
# LemmaFilter.java:190-203 propn set)
PROPN = frozenset(
    {
        "Paris", "France", "Victor", "Hugo", "Rousseau", "Voltaire",
        "Napoléon", "Seine", "Lyon", "Molière", "Racine", "Balzac",
        "Jerry", "Tom",
    }
)

# ------------------------------------------------------------------ MWEs

# token-sequence → (canonical form, POS) — keys are POST-CLITIC-SPLIT
# sequences, mirroring the reference's practice of compiling MWE entries
# through the same analysis chain (FrenchAnalyzer.java:370-388,
# LexiconHelper.java:128-192; matcher: MweFilter.java:82-325)
MWE: dict[tuple[str, ...], tuple[str, str]] = {
    ("chemin", "de", "fer"): ("chemin de fer", "NOUN"),
    ("pomme", "de", "terre"): ("pomme de terre", "NOUN"),
    ("coup", "de", "œil"): ("coup d'œil", "NOUN"),       # d' → de split
    ("tout", "à", "fait"): ("tout à fait", "ADV"),
    ("au", "fur", "et", "à", "mesure"): ("au fur et à mesure", "ADV"),
    ("ce", "est", "à", "dire"): ("c'est-à-dire", "CCONJ"),  # c' → ce split
    ("parce", "que"): ("parce que", "SCONJ"),
    ("chef", "de", "œuvre"): ("chef-d'œuvre", "NOUN"),
}
MWE_MAX_LEN = max(len(k) for k in MWE)

# ------------------------------------------------------------- stopwords

# surface-form stopword drop, pre-lemma (reference FrenchAnalyzer.java:302)
STOPWORDS = frozenset(
    {
        "le", "la", "les", "l'", "un", "une", "des", "de", "du", "au",
        "aux", "et", "ou", "mais", "donc", "or", "ni", "car", "ne", "pas",
        "plus", "ce", "cette", "ces", "cet", "son", "sa", "ses", "leur",
        "leurs", "notre", "votre", "nos", "vos", "mon", "ma", "mes",
        "je", "tu", "il", "elle", "on", "nous", "vous", "ils", "elles",
        "me", "te", "se", "moi", "toi", "lui", "eux", "y", "en", "qui",
        "que", "quoi", "dont", "où", "à", "dans", "sur", "sous", "avec",
        "sans", "pour", "par", "vers", "chez", "est", "sont", "était",
        "fut", "sera", "a", "ont", "avait", "ai", "as", "avons", "avez",
        "suis", "es", "sommes", "êtes", "si", "comme", "quand", "tout",
        "tous", "toute", "toutes", "même", "aussi", "alors", "très",
        "bien", "être", "avoir", "cela", "ça", "se", "s'", "d'", "n'",
        "j'", "m'", "t'", "c'", "qu'",
    }
)

# ----------------------------------------------------- dot abbreviations

# configured dotted abbreviations whose final dot stays attached — the
# reference's brevidots set, loaded CASE-INSENSITIVELY
# (FrenchLexicons.buildBrevidots: CharArraySet(300, true) over
# fr/src/resources/.../brevidots.csv; consumed by
# MarkupTokenizer.isBrevidot, MarkupTokenizer.java:414-434). Stored
# lowercase; membership tests lowercase the probe. Structural
# brevidots (single initials, U.S.A.-style dotted abbreviations,
# J.-J. hyphenated initial chains) are detected by shape in
# tokenizer._is_brevidot, not listed here. Multiword entries of the
# source file (e.g. "loc. cit.") are inert — a token never contains a
# space — and are omitted.
BREVIDOTS = frozenset(
    {
        "&c.", "&amp;c.", "act.", "ap.", "arch.", "art.", "aug.",
        "av.", "avr.", "c.-à-d.", "categ.", "catég.", "cf.", "ch.",
        "chap.", "cit.", "cl.", "coll.", "confér.", "conch.", "cpt.",
        "dec.", "déc.", "def.", "déf.", "dist.", "dr.", "ed.", "éd.",
        "educ.", "éduc.", "eq.", "éq.", "etc.", "ex.", "exp.",
        "expér.", "fam.", "fasc.", "fev.", "fevr.", "fig.", "fol.",
        "fr.", "fréq.", "gen.", "hab.", "hist.", "ib.", "ibid.",
        "id.", "introd.", "j.-cl.", "jan.", "janv.", "journ.",
        "juil.", "juill.", "liv.", "loc.", "me.", "melle.", "mich.",
        "mlle.", "mm.", "moy.", "mr.", "ms.", "ncpt.", "nov.",
        "obs.", "oct.", "op.", "pag.", "ph.", "phr.", "pl.", "pp.",
        "p.p.", "pr.", "probl.", "prop.", "prs.", "p.s.", "ps.",
        "psych.", "psychol.", "pt.", "quest.", "rech.", "rev.",
        "sc.", "sect.", "sept.", "séq.", "sq.", "sqq.", "st.",
        "suppl.", "tabl.", "techn.", "tel.", "tél.", "telep.",
        "téleph.", "télép.", "téléph.", "teleph.", "trad.", "vol.",
        "voy.",
    }
)

# -------------------------------------------------- protected caps words

# all-caps words kept verbatim (reference ucwords.csv +
# UppercaseFilter.java:19-99: unprotected all-caps < 4 letters deleted)
UCWORDS = frozenset(
    {"CNRS", "UNESCO", "SNCF", "TGV", "ONU", "USA", "ADN", "TVA", "RATP"}
)
