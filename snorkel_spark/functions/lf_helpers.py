"""LF helper expression library (SURVEY.md §2.5, H1–H6).

Reference: ⚠ snorkel/lf_helpers.py (reconstructed — SURVEY.md §0):
``get_text_between`` (~L40–60), ``get_between_tokens`` (~L60–90),
``get_left_tokens``/``get_right_tokens`` (~L90–140), ``get_tagged_text``
(~L140–170), ``contains_token``/``is_inverted`` (~L170–200), regex LF
templates (~L200–280).

Every helper is a Catalyst ``Column`` factory over the candidate table
(whose extractor precomputed ``tokens_between``/``text_between``), so
LF bodies built from them stay entirely JVM-side.  Helpers that need
the full sentence token array take a candidates-joined-with-sentences
frame (``with_sentence_tokens``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_sentence_tokens(candidates: DataFrame, sentences: DataFrame) -> DataFrame:
    """Attach the sentence token array for window/tagged-text helpers."""
    toks = sentences.select(F.col("sentence_id").alias("__sid"), "tokens")
    return candidates.join(toks, on=[candidates["sentence_id"] == toks["__sid"]], how="left").drop(
        "__sid"
    )


# --- H1 / H2 -------------------------------------------------------
def get_text_between() -> Column:
    return F.col("text_between")


def get_between_tokens() -> Column:
    return F.col("tokens_between")


# --- H3 window tokens (requires sentence tokens) -------------------
def get_left_tokens(window: int = 3, of: str = "subj") -> Column:
    return F.expr(
        f"slice(tokens, greatest({of}_ws - {window} + 1, 1), least({window}, {of}_ws))"
    )


def get_right_tokens(window: int = 3, of: str = "obj") -> Column:
    return F.expr(f"slice(tokens, {of}_we + 2, {window})")


# --- H4 tagged text -------------------------------------------------
def get_tagged_text() -> Column:
    """Sentence text with {{A}}/{{B}} substituted for the spans —
    rebuilt from tokens (single-space join), all built-ins."""
    return F.expr(
        """
        array_join(
          flatten(transform(tokens, (tt, ti) ->
            case
              when ti = subj_ws then array('{{A}}')
              when ti > subj_ws and ti <= subj_we then array()
              when ti = obj_ws then array('{{B}}')
              when ti > obj_ws and ti <= obj_we then array()
              else array(tt)
            end)),
          ' ')
        """
    )


# --- H5 -------------------------------------------------------------
def contains_token(tok: str, col: str = "tokens_between") -> Column:
    return F.array_contains(col, tok)


def is_inverted() -> Column:
    return F.col("subj_ws") > F.col("obj_ws")


# --- H6 regex LF templates ------------------------------------------
def rule_regex_search_tagged_text(rgx: str, label: int, tagged_col: str = "tagged_text") -> Column:
    return F.when(F.col(tagged_col).rlike(rgx), F.lit(label)).otherwise(F.lit(0))


def rule_regex_search_btw_AB(rgx: str, label: int) -> Column:
    """Regex over the text strictly between spans, subj before obj."""
    return F.when(
        (~is_inverted()) & F.col("text_between").rlike(rgx), F.lit(label)
    ).otherwise(F.lit(0))


def rule_regex_search_btw_BA(rgx: str, label: int) -> Column:
    return F.when(is_inverted() & F.col("text_between").rlike(rgx), F.lit(label)).otherwise(
        F.lit(0)
    )


def rule_text_btw(term: str, label: int) -> Column:
    return F.when(F.array_contains("tokens_between", term), F.lit(label)).otherwise(F.lit(0))
