"""Vocabulary / mapping tables used by the cleaning + classification
functions.

The *values* reproduce the reference tables (hepcrawl/mappings.py:13-204)
exactly — they are the parity contract for title capitalization, doctype
classification, language translation and license canonicalization — but
are organized here as frozen sets / merged dicts keyed for O(1) probes
inside vectorized batches.
"""

from __future__ import annotations

import re

# Acronyms kept upper-case by title capitalization
# (reference: hepcrawl/mappings.py:13-78, used by inputs.py:32-45).
ACRONYMS = frozenset(
    """LHC CFT QCD QED QFT ABJM NLO LO NNLO IIB IIA MSSM NMSSM SYM WIMP
    ATLAS CMS ALICE RHIC DESY HERA CDF D0 BELLE BABAR BFKL DGLAP SUSY QM
    UV IR BRST PET GPS NMR XXZ CMB LISA CPT KEK TRIUMF PHENIX VLBI NGC
    SNR HESS AKARI GALEX ESO J-PARC CERN XFEL FAIUR ILC CLIC SPS BNL
    CEBAF SRF LINAC HERMES ZEUS H1 GRB""".split()
)

# Words flagging a conference paper / thesis in arXiv "comments"
# (reference: hepcrawl/mappings.py:80-137, regexes arxiv_spider.py:23-26).
CONFERENCE_WORDS = (
    "colloquium colloquiums conf conference conferences contrib contributed "
    "contribution contributions forum lecture lectures meeting meetings "
    "pres presented proc proceeding proceedings rencontre rencontres school "
    "schools seminar seminars symp symposium symposiums talk talks workshop "
    "workshops"
).split()

THESIS_WORDS = (
    "diploma diplomarbeit diplome dissertation doctoraal doctoral doctorat "
    "doctorate doktorarbeit habilitationsschrift hochschule "
    "inauguraldissertation memoire phd proefschrift schlussbericht "
    "staatsexamensarbeit tesi thesis travail"
).split()

RE_CONFERENCE = re.compile(
    r"\b(%s)\b" % "|".join(re.escape(w) for w in CONFERENCE_WORDS),
    re.I | re.U,
)
RE_THESIS = re.compile(
    r"\b(%s)\b" % "|".join(re.escape(w) for w in THESIS_WORDS),
    re.I | re.U,
)

# MathML tags preserved when stripping markup from titles/abstracts
# (reference: hepcrawl/mappings.py:139-146).
MATHML_TAGS = frozenset(
    """annotation annotation-xml maction math merror mfenced mfrac mi
    mmultiscripts mn mo mover mpadded mphantom mprescripts mroot mrow
    mspace msqrt mstyle msub msubsup msup mtable mtd mtext mtr munder
    munderover none semantics""".split()
)

# ISO-639 (2- and 3-letter) → English language name; English itself is
# dropped by translate (reference: hepcrawl/mappings.py:148-187).
_LANG_BASE = {
    "fr": "French", "ru": "Russian", "ge": "German", "es": "Spanish",
    "la": "Latin", "it": "Italian", "ja": "Japanese", "pt": "Portuguese",
    "cn": "Chinese", "ro": "Romanian", "pl": "Polish", "nl": "Dutch",
    "cs": "Czech", "id": "Indonesian", "no": "Norwegian", "sv": "Swedish",
    "he": "Hebrew", "hu": "Hungarian", "ko": "Korean",
}
_LANG_3 = {
    "fre": "French", "rus": "Russian", "ger": "German", "esp": "Spanish",
    "lat": "Latin", "ita": "Italian", "jap": "Japanese", "por": "Portuguese",
    "chi": "Chinese", "rom": "Romanian", "pol": "Polish", "dut": "Dutch",
    "cze": "Czech", "ind": "Indonesian", "nor": "Norwegian",
    "swe": "Swedish", "heb": "Hebrew", "hun": "Hungarian", "kor": "Korean",
}
LANGUAGE_NAMES = {**_LANG_BASE, **_LANG_3}

# License-URL substring → canonical prefix; the version suffix of the URL
# is preserved (reference: hepcrawl/mappings.py:189-193, utils.py:266-279).
LICENSE_URL_PREFIXES = {
    "creativecommons.org/licenses/by/": "CC-BY-",
    "creativecommons.org/licenses/by-nc-sa/": "CC-BY-NC-SA-",
    "arxiv.org/licenses/nonexclusive-distrib/": "arXiv-",
}

# Free-text license phrase → representative URL
# (reference: hepcrawl/mappings.py:195-204).
LICENSE_TEXT_URLS = {
    "Creative Commons Attribution-NonCommercial-ShareAlike":
        "https://creativecommons.org/licenses/by-nc-sa/3.0",
    "Creative Commons Attribution 2.0":
        "http://creativecommons.org/licenses/by/2.0/",
    "Creative Commons Attribution 3.0":
        "http://creativecommons.org/licenses/by/3.0/",
    "Creative Commons Attribution 4.0":
        "http://creativecommons.org/licenses/by/4.0/",
}
