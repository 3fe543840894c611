"""Shared DuckDB-SQL building blocks for oracle queries.

These mirror the Spark operators' semantics exactly (see
``operators/tokenize.py`` for the contract). DuckDB's ``regexp_replace``
needs the ``'g'`` flag to replace globally (Spark's replaces all matches
by default).
"""

# documents -> one row per raw whitespace token (doc_id, tok)
TOKENS_CTE = """
tok AS (
    SELECT doc_id, unnest(string_split_regex(text, '[ \t\n]+')) AS tok
    FROM documents
)
"""

# documents -> distinct cleaned (word, doc_id) pairs
WORDS_CTE = (
    TOKENS_CTE
    + """,
w_raw AS (
    SELECT DISTINCT lower(regexp_replace(tok, '[^A-Za-z]', '', 'g')) AS word, doc_id
    FROM tok
),
words AS (
    SELECT word, doc_id FROM w_raw WHERE length(word) > 0
)
"""
)

# documents -> cleaned token sequence with per-doc position (order preserved,
# empties dropped) — for shingling.
ORDERED_WORDS_CTE = """
tokpos AS (
    SELECT doc_id,
           unnest(l) AS tok,
           unnest(range(len(l))) AS pos
    FROM (SELECT doc_id, string_split_regex(text, '[ \t\n]+') AS l FROM documents)
),
cleanpos AS (
    SELECT doc_id, lower(regexp_replace(tok, '[^A-Za-z]', '', 'g')) AS word, pos
    FROM tokpos
),
ordered_words AS (
    SELECT doc_id, word, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS seq
    FROM cleanpos WHERE length(word) > 0
)
"""
