"""Alias-in-WHERE/HAVING resolution (SURVEY.md P7).

ClickHouse lets WHERE and HAVING reference SELECT-list aliases -- even
aggregate aliases in HAVING (/root/reference/README.md:80-84,113-115,
e.g. ``WHERE `ym:s:date` >= ...`` where ``ym:s:date`` is itself an
alias of ``StartDate``).  Spark SQL does not resolve select aliases in
WHERE, so the engine inlines the alias's defining expression into the
predicate before handing the SQL to Spark.  Pure front-end rewrite --
no Catalyst change (SURVEY.md section 4).
"""

from __future__ import annotations

import re


def _strip_strings(sql: str) -> str:
    """Blank out string literals so alias tokens inside them are ignored."""
    return re.sub(r"'(?:[^'\\]|\\.)*'", lambda m: " " * len(m.group(0)), sql)


def inline_aliases(predicate: str, aliases: dict[str, str]) -> str:
    """Rewrite ``predicate`` replacing each alias with its definition.

    ``aliases`` maps alias name -> defining SQL expression.  Backtick-
    quoted aliases (the reference uses names like ``ym:s:date``,
    README.md:75-86) and plain-identifier aliases are both handled;
    replacements are parenthesized to preserve precedence.

    All match spans are located on the ORIGINAL string and spliced in
    one pass -- sequential re-substitution would rescan text produced
    by earlier replacements, so an alias whose definition mentions its
    own name (``visits -> visits + 1``) or another alias's name would
    expand recursively (hypothesis-found bug).  String literals are
    masked out before matching; overlapping spans resolve longest-
    match-first.
    """
    masked = _strip_strings(predicate)
    spans: list[tuple[int, int, str]] = []
    for name, definition in aliases.items():
        expr = f"({definition})"
        # the dot/backtick lookarounds keep QUALIFIED references
        # (``l.k`` where ``k`` is also a SELECT alias) and quoted
        # names intact: an alias name is only an alias reference when
        # it stands alone (r12, closing the r11 deferral — a bare
        # ``\b`` scan rewrote ``GROUP BY l.k`` into ``l.(l.k)``)
        for m in re.finditer(
            rf"(?<![\w.`]){re.escape(f'`{name}`')}", masked
        ):
            spans.append((m.start(), m.end(), expr))
        if re.fullmatch(r"\w+", name):
            for m in re.finditer(
                rf"(?<![\w.`]){re.escape(name)}(?![\w`])", masked
            ):
                spans.append((m.start(), m.end(), expr))
    spans.sort(key=lambda s: (s[0], -(s[1] - s[0])))
    pieces: list[str] = []
    last = 0
    for start, end, expr in spans:
        if start < last:
            continue  # nested inside an already-replaced span
        pieces.append(predicate[last:start])
        pieces.append(expr)
        last = end
    pieces.append(predicate[last:])
    return "".join(pieces)


def select_with_aliases(
    table_sql: str,
    select_items: dict[str, str],
    where: str | None = None,
    group_by: list[str] | None = None,
    having: str | None = None,
    order_by: str | None = None,
    limit: str | None = None,
) -> str:
    """Build ClickHouse-flavoured SQL (aliases usable in WHERE/GROUP
    BY/HAVING/ORDER BY) as plain Spark SQL.

    ``select_items`` maps output alias -> expression.  WHERE gets
    non-aggregate aliases inlined; HAVING/ORDER BY keep aggregate
    aliases (Spark resolves aliases there when filtering after agg is
    expressed via a wrapping subquery, which this builder emits).
    """
    sel = ", ".join(f"{expr} AS `{name}`" for name, expr in select_items.items())
    inner = f"SELECT {sel} FROM {table_sql}"
    if where:
        inner = (
            f"SELECT {sel} FROM {table_sql} "
            f"WHERE {inline_aliases(where, select_items)}"
        )
    if group_by:
        gb = ", ".join(inline_aliases(g, select_items) for g in group_by)
        inner += f" GROUP BY {gb}"
    sql = f"SELECT * FROM ({inner})"
    if having:
        sql += f" WHERE {having}"  # aggregate aliases now plain columns
    if order_by:
        sql += f" ORDER BY {order_by}"
    if limit:
        sql += f" LIMIT {limit}"
    return sql
