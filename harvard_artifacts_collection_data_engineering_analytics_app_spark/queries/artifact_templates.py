"""The reference's 20 SQL templates, verbatim modulo identifier quoting.

Source: ``QUERY_TEMPLATES`` at ``harvard_artifacts_app.py:289-313``. The
only edit is the reserved word ``rank``: MySQL backticks become ``{q}rank{q}``
with the quote char parameterized (backtick for Spark SQL, double-quote for
DuckDB). These run against artifact-shaped tables (schemas.ARTIFACT_*);
``tests/test_artifact_queries.py`` executes every one on both engines.
"""

from __future__ import annotations

QUERY_TEMPLATES: dict[str, str] = {
    "q1": (
        "SELECT * FROM artifactmetadata "
        "WHERE century = '11th century' AND culture = 'Byzantine'"
    ),
    "q2": (
        "SELECT DISTINCT culture FROM artifactmetadata "
        "WHERE culture IS NOT NULL AND culture != ''"
    ),
    "q3": "SELECT * FROM artifactmetadata WHERE period LIKE '%Archaic%'",
    "q4": (
        "SELECT title, accessionyear FROM artifactmetadata "
        "WHERE accessionyear IS NOT NULL ORDER BY accessionyear DESC LIMIT 20"
    ),
    "q5": (
        "SELECT department, COUNT(*) as count FROM artifactmetadata "
        "GROUP BY department"
    ),
    "q6": (
        "SELECT m.title, a.imagecount FROM artifactmetadata m "
        "JOIN artifactmedia a ON m.id = a.objectid "
        "WHERE a.imagecount > 1 LIMIT 20"
    ),
    "q7": (
        "SELECT AVG({q}rank{q}) as avg_rank FROM artifactmedia "
        "WHERE {q}rank{q} IS NOT NULL"
    ),
    "q8": (
        "SELECT m.title, a.colorcount, a.mediacount FROM artifactmetadata m "
        "JOIN artifactmedia a ON m.id = a.objectid "
        "WHERE a.colorcount > a.mediacount LIMIT 20"
    ),
    "q9": (
        "SELECT m.title, a.datebegin, a.dateend FROM artifactmetadata m "
        "JOIN artifactmedia a ON m.id = a.objectid "
        "WHERE a.datebegin BETWEEN 1500 AND 1600 LIMIT 20"
    ),
    "q10": "SELECT COUNT(*) as count FROM artifactmedia WHERE mediacount = 0",
    "q11": "SELECT DISTINCT hue FROM artifactcolors WHERE hue IS NOT NULL",
    "q12": (
        "SELECT color, COUNT(*) as frequency FROM artifactcolors "
        "GROUP BY color ORDER BY frequency DESC LIMIT 5"
    ),
    "q13": (
        "SELECT hue, AVG(percent) AS avg_coverage FROM artifactcolors "
        "WHERE hue IS NOT NULL GROUP BY hue"
    ),
    "q14": (
        "SELECT m.title, m.culture, a.{q}rank{q} FROM artifactmetadata m "
        "JOIN artifactmedia a ON m.id = a.objectid "
        "WHERE m.period IS NOT NULL"
    ),
    "q15": "SELECT COUNT(*) AS total_color_entries FROM artifactcolors",
    "q16": (
        "SELECT m.title, c.hue FROM artifactmetadata m "
        "JOIN artifactcolors c ON m.id = c.objectid "
        "WHERE m.culture = 'Byzantine' LIMIT 20"
    ),
    "q17": (
        "SELECT m.title, c.hue FROM artifactmetadata m "
        "JOIN artifactcolors c ON m.id = c.objectid ORDER BY m.title"
    ),
    "q18": (
        "SELECT m.title, m.culture, a.{q}rank{q} FROM artifactmetadata m "
        "JOIN artifactmedia a ON m.id = a.objectid "
        "WHERE m.period IS NOT NULL"
    ),
    "q19": (
        "SELECT DISTINCT m.title FROM artifactmetadata m "
        "JOIN artifactmedia a ON m.id = a.objectid "
        "JOIN artifactcolors c ON m.id = c.objectid "
        "WHERE c.hue = 'Grey' AND a.{q}rank{q} <= 10"
    ),
    "q20": (
        "SELECT m.classification, COUNT(*) as artifact_count, "
        "AVG(a.mediacount) as avg_media FROM artifactmetadata m "
        "JOIN artifactmedia a ON m.id = a.objectid "
        "GROUP BY m.classification ORDER BY artifact_count DESC LIMIT 10"
    ),
}

# Queries whose LIMIT makes row identity engine-dependent — either a bare
# LIMIT (q6/q8/q9/q16) or an ORDER BY on non-unique keys with ties at the
# cutoff (q4: accessionyear, q12: frequency, q20: artifact_count).
# Compared by row count only in the two-engine test; the rq* oracle
# queries lock the same shapes value-level with unique tie-breakers.
NONDETERMINISTIC_LIMIT = frozenset(
    {"q4", "q6", "q8", "q9", "q12", "q16", "q20"}
)


def spark_sql(name: str) -> str:
    return QUERY_TEMPLATES[name].format(q="`")


def duckdb_sql(name: str) -> str:
    return QUERY_TEMPLATES[name].format(q='"')
