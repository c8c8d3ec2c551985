"""Shared specification for the webtext quality pipeline.

These constants define the *semantics* both implementations must agree
on: the distributed Spark pipeline (``hooqu_spark/pipeline/core.py``)
and the independent row-at-a-time reference implementation
(``hooqu_spark/pipeline/reference_impl.py``) used as the parity oracle
(keep/drop F1 >= 0.99 and byte-identical scrubbed text per url).

Rule thresholds follow the published Gopher (Rae et al. 2021, table A1)
and C4 (Raffel et al. 2020) heuristic filters, adapted to the synthetic
lexicon scale.  Lexicons are small embedded seed vocabularies — the
sandbox substitute for fastText lid.176 / KenLM models (interfaces in
``langid.py`` / ``perplexity.py`` accept real models in production).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

# ---------------------------------------------------------------------------
# Language lexicons (seed vocabularies for the deterministic LID fallback)
# ---------------------------------------------------------------------------

LEXICONS: Dict[str, Tuple[str, ...]] = {
    "en": (
        "the be to of and a in that have it for not on with he as you do at"
        " this but his by from they we say her she or an will my one all"
        " would there their what so up out if about who get which go me when"
        " make can like time no just him know take people into year your"
        " good some could them see other than then now look only come its"
        " over think also back after use two how our work first well way"
        " even new want because any these give day most us great little"
        " world own old right still house where much before found those"
        " school never started between city earth eyes both paper together"
        " got group often run important until children side feet car mile"
        " night walk white sea began grow took river four carry state once"
        " book hear stop without second late miss idea enough eat face"
        " watch far really almost let above girl sometimes mountain cut"
        " young talk soon list song being leave family music"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht"
        " ein eine als auch es an werden aus er hat dass sie nach wird bei"
        " einer um am sind noch wie einem über einen so zum war haben nur"
        " oder aber vor zur bis mehr durch man sein wurde sei wenn unter"
        " wir sehr ihre dann ihr kann schon diese gegen vom ganz einzelnen"
        " wo muss ohne eines können seinen alle jahre wieder meine zeit"
        " gute immer leben etwas beiden mich heute weil weg welt selbst"
        " damit lange ersten geben dieser wissen jahren wurden stadt land"
        " kinder wasser augen beide papier zusammen gruppe wichtig seite"
        " nacht weiss meer fluss vier buch halt zweite spät genug essen"
        " gesicht fast junge reden bald liste lied familie musik berg"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du elle"
        " au pour pas vous par sur faire plus dire me on mon lui nous comme"
        " mais pouvoir avec tout y aller voir bien où sans tu ou leur homme"
        " si deux mari moi vouloir te femme venir quand grand celui si notre"
        " devoir là jour prendre même votre tout rien petit encore aussi"
        " quelque dont tout mer fois nouveau heure monde temps très savoir"
        " falloir voir quelques rester jeune seulement demander trouver"
        " donner premier beaucoup toujours ville pays enfants eau yeux"
        " papier ensemble groupe souvent important côté nuit blanc fleuve"
        " quatre livre arrêter deuxième tard assez manger visage presque"
        " montagne couper parler bientôt liste chanson famille musique"
    ).split(),
    "es": (
        "el la de que y a en un ser se no haber por con su para como estar"
        " tener le lo todo pero más hacer o poder decir este ir otro ese si"
        " me ya ver porque dar cuando él muy sin vez mucho saber qué sobre"
        " mi alguno mismo yo también hasta año dos querer entre así primero"
        " desde grande eso ni nos llegar pasar tiempo ella sí día uno bien"
        " poco deber entonces poner cosa tanto hombre parecer nuestro tan"
        " donde ahora parte después vida quedar siempre creer hablar llevar"
        " dejar nada cada seguir menos nuevo encontrar ciudad tierra ojos"
        " ambos papel juntos grupo importante lado noche blanco mar río"
        " cuatro libro parar segundo tarde bastante comer cara casi montaña"
        " cortar joven pronto lista canción familia música mundo agua"
    ).split(),
    "it": (
        "il di che e la a un essere per in una mi sono ho si lo ma ti ha le"
        " cosa con i no da se come ci io questo qui hai del tu non bene sei"
        " solo sì te più su era mio cose è questa già tutto loro molto noi"
        " anche chi perché voglio così vita fatto grazie ancora dove essere"
        " quando andare fare dire potere dovere volere sapere stare vedere"
        " venire tempo uomo giorno modo parte anno mondo mano città acqua"
        " occhi entrambi carta insieme gruppo spesso importante lato notte"
        " bianco mare fiume quattro libro fermare secondo tardi abbastanza"
        " mangiare faccia quasi montagna tagliare giovane presto lista"
        " canzone famiglia musica terra scuola casa donna"
    ).split(),
}

# Lexicons are SETS semantically (membership scoring); dedupe the
# authored word lists (order-preserving) so consumers that iterate or
# inline them — the DuckDB langid oracle joins tokens against a VALUES
# relation — can't double-count a word that was typed twice.
LEXICONS = {
    lang: tuple(dict.fromkeys(words)) for lang, words in LEXICONS.items()
}

LANGS: Tuple[str, ...] = tuple(sorted(LEXICONS))

# English stopwords used by the stop-word-fraction heuristic (C4 uses a
# similar small list; Gopher requires >= 2 of a tiny set).
EN_STOPWORDS = frozenset(
    "the be to of and a in that have it for not on with as you at this".split()
)

# Demo toxicity lexicon (placeholder; swap for a real blocklist).
TOXIC_WORDS: Tuple[str, ...] = ("stupid", "idiot", "moron", "scumbag")

# Scrub replacement tokens (applied in this exact order — order is part
# of the byte-identical contract).
SCRUB_EMAIL_TOKEN = "<EMAIL>"
SCRUB_CREDITCARD_TOKEN = "<CREDIT_CARD>"
SCRUB_TOXIC_TOKEN = "<TOXIC>"

# Per-token surprisal for the deterministic hash LM (perplexity.py):
# common (lexicon) words get LOW surprisal, unknown words get a
# deterministic value in [SURPRISAL_BASE, SURPRISAL_BASE + SURPRISAL_SPREAD).
SURPRISAL_COMMON = 2.0
SURPRISAL_BASE = 3.0
SURPRISAL_SPREAD = 3.0
SURPRISAL_EMPTY = 99.0


@dataclass(frozen=True)
class RuleSet:
    """Gopher/C4-style keep/drop thresholds.

    Every field maps 1:1 to a named boolean rule column emitted by the
    pipeline; ``keep`` is the conjunction of all rules.
    """

    min_words: int = 50
    max_words: int = 100000
    min_mean_word_length: float = 3.0
    max_mean_word_length: float = 10.0
    max_symbol_to_word_ratio: float = 0.1
    max_bullet_line_frac: float = 0.9
    max_ellipsis_line_frac: float = 0.3
    min_alpha_word_frac: float = 0.8
    min_stopword_frac: float = 0.04
    max_top2gram_frac: float = 0.20
    max_top3gram_frac: float = 0.18
    max_dup5gram_frac: float = 0.30
    target_lang: str = "en"
    min_lang_score: float = 0.5
    max_log_ppl: float = 4.5

    def rule_names(self) -> List[str]:
        return [
            "rule_n_words",
            "rule_mean_word_length",
            "rule_symbol_ratio",
            "rule_bullet_lines",
            "rule_ellipsis_lines",
            "rule_alpha_words",
            "rule_stopwords",
            "rule_top2gram",
            "rule_top3gram",
            "rule_dup5gram",
            "rule_lang",
            "rule_ppl",
        ]


DEFAULT_RULES = RuleSet()

# Feature columns the enrich stage appends to the input table.
FEATURE_FIELDS: List[Tuple[str, str]] = [
    ("n_chars", "int"),
    ("n_words", "int"),
    ("mean_word_length", "double"),
    ("symbol_to_word_ratio", "double"),
    ("bullet_line_frac", "double"),
    ("ellipsis_line_frac", "double"),
    ("alpha_word_frac", "double"),
    ("stopword_frac", "double"),
    ("top2gram_frac", "double"),
    ("top3gram_frac", "double"),
    ("dup5gram_frac", "double"),
    ("lang_pred", "string"),
    ("lang_score", "double"),
    ("log_ppl", "double"),
    ("n_emails", "int"),
    ("n_creditcards", "int"),
    ("n_toxic", "int"),
    ("scrubbed_text", "string"),
]
