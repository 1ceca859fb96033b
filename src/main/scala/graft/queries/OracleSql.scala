package graft.queries

/** Oracle-SQL cost control: force `AS MATERIALIZED` on CTE heads.
  *
  * DuckDB (1.x) inlines every non-recursive CTE once per reference. Two
  * distinct blowups follow for the oracle SQL this repo authors:
  *
  *  - a CTE referenced many times TRANSITIVELY through a chain (the q_v12
  *    trained-PQ Lloyd iterations) multiplies through the chain and the
  *    binder plan explodes (measured: OOM at n = 500);
  *  - a non-recursive CTE referenced from inside a RECURSIVE CTE's step
  *    is re-evaluated ONCE PER ITERATION — and when that inner CTE is
  *    itself fed by another recursion (ADX: rec2's step joins `dxt`,
  *    which chains off the rec1 recursion), the whole upstream recursion
  *    re-runs per step, turning an O(L) recurrence into O(L²) full
  *    re-evaluations. Measured at sf0.01 (150 series × ≤86 rows):
  *    q_r7_adx 315 s → ~1 s, q_e1b 178 s → 1.9 s, purely from
  *    materialization. This was the entire cost of the driver's t2
  *    correctness gate (VERDICT r13 next #2).
  *
  * Forcing `AS MATERIALIZED` evaluates each head once — semantics
  * unchanged (verified hash-green via tools/check_oracle.py), cost
  * linear. DuckDB accepts the keyword on recursive heads too (no-op).
  *
  * The rewrite takes an EXPLICIT name set because `name AS (` is not
  * always a CTE head: `WINDOW pf12 AS (...)` window clauses share the
  * token shape, and a blanket rewrite breaks the parse. Call sites own
  * their oracle strings, so they know their heads; [[CteHeadsSpec]] pins
  * every listed name to an actual head in the generated SQL. The scanner
  * is quote-aware ('…' literals, "…" identifiers) and skips SQL comments
  * (`-- …\n`, `/* … */`) so an apostrophe inside a comment cannot desync
  * the string tracker (ADVICE r13 #2).
  */
private[graft] object OracleSql {

  /** Rewrite `n AS (` → `n AS MATERIALIZED (` for each n in `names`,
    * outside string literals, quoted identifiers, and comments, at
    * identifier boundaries only. Every listed name MUST match at least
    * one head in `sql` — a stale list (a renamed CTE, a typo like `dx`
    * for `dxt`) would otherwise silently revert that head to inlining
    * and re-inflate the O(L²) recursion cost the rewrite exists to
    * kill; the require makes it fail at oracle-build time instead
    * (exercised by CteHeadsSpec; every Verify run builds every oracle
    * string, so staleness cannot reach the driver's gate silently). */
  def materialize(sql: String, names: Set[String]): String = {
    val applied = scala.collection.mutable.Set[String]()
    val out = new StringBuilder(sql.length + 32 * names.size)
    var i = 0
    def identChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { // string literal (doubled '' toggles twice — net correct)
        out.append(c); i += 1
        while (i < sql.length && sql.charAt(i) != '\'') { out.append(sql.charAt(i)); i += 1 }
        if (i < sql.length) { out.append('\''); i += 1 }
      } else if (c == '"') { // quoted identifier
        out.append(c); i += 1
        while (i < sql.length && sql.charAt(i) != '"') { out.append(sql.charAt(i)); i += 1 }
        if (i < sql.length) { out.append('"'); i += 1 }
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') { out.append(sql.charAt(i)); i += 1 }
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        val stop = if (end < 0) sql.length else end + 2
        out.append(sql.substring(i, stop)); i = stop
      } else if ((c.isLetter || c == '_') &&
          (i == 0 || !identChar(sql.charAt(i - 1)))) {
        var j = i
        while (j < sql.length && identChar(sql.charAt(j))) j += 1
        val word = sql.substring(i, j)
        // ignoreCase (ADVICE r14 #3): a lowercase 'as (' head would
        // otherwise be invisible to BOTH scanners — the harvest returns
        // zero heads, the coverage require passes vacuously, and the
        // O(L^2) inlining cost returns silently
        if (names(word) && sql.regionMatches(true, j, " AS (", 0, 5)) {
          applied += word
          out.append(word).append(" AS MATERIALIZED (")
          i = j + 5
        } else { out.append(word); i = j }
      } else { out.append(c); i += 1 }
    }
    require(applied.size == names.size,
      s"OracleSql.materialize: no CTE head found for " +
        s"${(names -- applied).toSeq.sorted.mkString(", ")} — stale head list?")
    out.toString
  }

  /** Collect every `ident AS (` head with the SAME quote/comment-aware
    * walk [[materialize]] applies with — a regex harvest would also
    * collect a `name AS (` that lives only inside a comment or string
    * literal, which the apply scanner then never rewrites, tripping the
    * coverage require on perfectly valid SQL. */
  private def scanHeads(sql: String): Set[String] = {
    val names = scala.collection.mutable.Set[String]()
    var i = 0
    def identChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') {
        i += 1
        while (i < sql.length && sql.charAt(i) != '\'') i += 1
        if (i < sql.length) i += 1
      } else if (c == '"') {
        i += 1
        while (i < sql.length && sql.charAt(i) != '"') i += 1
        if (i < sql.length) i += 1
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        i = if (end < 0) sql.length else end + 2
      } else if ((c.isLetter || c == '_') &&
          (i == 0 || !identChar(sql.charAt(i - 1)))) {
        var j = i
        while (j < sql.length && identChar(sql.charAt(j))) j += 1
        // ignoreCase: keep in lockstep with materialize's matcher
        if (sql.regionMatches(true, j, " AS (", 0, 5)) names += sql.substring(i, j)
        i = j
      } else i += 1
    }
    names.toSet
  }

  /** Rewrite EVERY `ident AS (` head. Only valid for SQL with no WINDOW
    * clauses (a `WINDOW w AS (` definition shares the token shape); the
    * require makes a misuse fail loudly at build time instead of
    * producing SQL DuckDB can't parse. */
  def materializeAll(sql: String): String = {
    require(!sql.contains("WINDOW "),
      "materializeAll on SQL with a WINDOW clause — pass explicit CTE names")
    val heads = scanHeads(sql)
    // a zero-head harvest on a 'materialize everything' call means the
    // scanner failed to see the heads the caller knows are there (ADVICE
    // r14 #3's failure class) — fail loudly instead of rewriting nothing
    require(heads.nonEmpty,
      "materializeAll found no CTE heads — scanner/SQL out of sync?")
    materialize(sql, heads)
  }
}
