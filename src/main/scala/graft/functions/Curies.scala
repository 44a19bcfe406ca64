package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CURIE / identifier surgery — the reference's per-row "expression library"
  * (SURVEY §2.8), re-expressed as pure codegen'd Column chains (no UDFs:
  * every function here composes `org.apache.spark.sql.functions`, so
  * whole-stage codegen and predicate pushdown survive).
  *
  * Null semantics match the reference: unmapped / malformed input yields
  * null, never an error (reference intact.py:458-510 returns None+warn).
  */
object Curies {

  /** F1/F2 (reference intact.py:408-433): split a pipe-delimited list,
    * trim, return the first token carrying `prefix` — or null.
    *
    * Implemented as ONE codegen'd regexp (leftmost token whose
    * trimmed form starts with the prefix) rather than the obvious
    * split→transform→filter chain: higher-order functions are
    * CodegenFallback, and this function sits inside the G1/G2 grounding
    * mega-projection — one HOF there drops the whole collapsed projection
    * out of whole-stage codegen.
    *
    * ` *` (not `\s*`) mirrors the reference's `trim()` space-only
    * semantics; a prefix containing '|' can never match the `[^|]*` token
    * body, so it is rejected up front instead of silently never matching. */
  def firstWithPrefix(c: Column, prefix: String): Column = {
    require(!prefix.contains("|"),
      s"firstWithPrefix: prefix must not contain '|' (got '$prefix')")
    nullif(trim(regexp_extract(c,
      "(?:^|\\|) *(" + java.util.regex.Pattern.quote(prefix) + "[^|]*)",
      1)), lit(""))
  }

  /** The identifier part of the first `prefix:`-token (e.g. pmid). */
  def firstIdWithPrefix(c: Column, prefix: String): Column =
    regexp_replace(firstWithPrefix(c, prefix), "^" + prefix, "")

  /** The CURIE split pattern. `(?s)` (DOTALL) so values with embedded
    * newlines still match — without it `uniprotkb:a\nb` fails the match
    * (extract returns ''), which would disagree with the
    * CuriePrefixPushdown rewrite to StartsWith. */
  private[graft] val CuriePattern = "(?s)^([^:]*):(.*)$"

  /** CURIE prefix: text before the first ':' (null if no colon). */
  def curiePrefix(c: Column): Column = {
    val p = regexp_extract(c, CuriePattern, 1)
    when(p === "", null).otherwise(p)
  }

  /** CURIE local identifier: text after the first ':' (null if no colon). */
  def curieIdentifier(c: Column): Column = {
    val m = regexp_extract(c, CuriePattern, 2)
    when(curiePrefix(c).isNull, null).otherwise(m)
  }

  /** Strip surrounding double quotes (chebi CURIEs arrive quoted:
    * `chebi:"CHEBI:15996"`, reference intact.py:472-479). */
  def unquote(c: Column): Column = regexp_replace(c, "^\"|\"$", "")

  /** F5 (reference biogrid.py:176-196): pipe-list of CURIEs → array of
    * [prefix, identifier] structs, dropping malformed members. */
  def xrefList(c: Column): Column =
    filter(
      transform(split(c, "\\|"),
        t => struct(curiePrefix(trim(t)).as("prefix"),
                    curieIdentifier(trim(t)).as("identifier"))),
      s => s.getField("prefix").isNotNull)

  /** F7 (reference intact.py:633-634): collapse internal whitespace. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** F11 (reference compath/mixins.py:43-46): identifiers.org URL. */
  def identifiersOrgUrl(prefix: Column, identifier: Column): Column =
    concat(lit("https://identifiers.org/"), prefix, lit(":"), identifier)

  /** F10: strip a literal prefix if present, else pass through. */
  def stripPrefix(c: Column, prefix: String): Column =
    when(c.startsWith(prefix), c.substr(lit(prefix.length + 1), length(c))).otherwise(c)

  /** F12 (reference utils.py:65, pystow name_from_url): the final path
    * segment of a URL. */
  def nameFromUrl(url: Column): Column =
    regexp_extract(url, "([^/]+)$", 1)
}
