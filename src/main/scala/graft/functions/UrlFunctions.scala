package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/host parsing for the domain-curation tier — every public
  * web-corpus pipeline (C4, RefinedWeb, FineWeb) filters and rolls up
  * by URL host/domain before anything else touches the text.
  *
  * Pure `regexp_extract` column expressions with exact DuckDB twins
  * (the `sql*` builders) — codegen'd, no UDFs, narrow per-row
  * transforms that are shuffle-free at any scale.
  */
object UrlFunctions {

  /** `scheme://[userinfo@]HOST[:port][/path...]` — capture group 1 is
    * the host. Scheme per RFC 3986 (letter then letter/digit/+/-/.);
    * userinfo is dropped, the host ends at `:`, `/`, `?` or `#`.
    * RFC 3986 IPv6/IPvFuture bracket literals (`[::1]`) are captured
    * whole via the first alternative — without it the reg-name
    * character class would stop at the first `:` inside the brackets.
    * Lowercased (host names are case-insensitive); empty string when
    * the input is not a URL. */
  val HostRe =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]]*\\]|[^/:?#]+)"

  def host(url: Column): Column = lower(regexp_extract(url, HostRe, 1))
  def sqlHost(e: String): String =
    s"lower(regexp_extract($e, '$HostRe', 1))"

  /** Registered-domain heuristic: the last two dot-labels of the host
    * (`a.b.example.com` → `example.com`); a host with fewer than two
    * labels (e.g. `localhost`) is returned whole. A faithful public-
    * suffix-list lookup needs the PSL data file — this is the
    * deterministic, dependency-free approximation of it, which is
    * exact for all generic TLDs (the PSL refines only multi-label
    * suffixes like `co.uk`). */
  private val DomRe = "([^.]+\\.[^.]+)$"

  def registeredDomain(hostC: Column): Column = {
    val d = regexp_extract(hostC, DomRe, 1)
    when(d === "", hostC).otherwise(d)
  }
  def sqlRegisteredDomain(e: String): String = {
    // RE2 pattern text is identical; built by concatenation to keep
    // the `$` anchor out of Scala string interpolation
    val d = "regexp_extract(" + e + ", '([^.]+\\.[^.]+)$', 1)"
    s"CASE WHEN $d = '' THEN $e ELSE $d END"
  }
}
