package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.charset.CodingErrorAction
import java.nio.ByteBuffer
import scala.util.matching.Regex

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Deterministic, pure HTML extraction (SURVEY.md §3.2 X1–X3).
 *
 * The north rule requires the extracted text per url to be **byte-identical**
 * across runs (BASELINE.json:15 — per-row invariant). Everything here is a pure
 * function of the input bytes: pinned charset (UTF-8, malformed input replaced),
 * pinned entity table, pinned whitespace normalization. No locale, no wall
 * clock, no JVM hash seeds.
 *
 * Extraction spec (pinned — the engine's contract, golden-tested in
 * HtmlSpec):
 *  1. decode bytes as UTF-8 with U+FFFD replacement for malformed sequences;
 *  2. drop `<script>`/`<style>` elements including content (case-insensitive);
 *  3. drop HTML comments `<!-- ... -->`;
 *  4. replace every remaining tag `<...>` with a single space;
 *  5. decode entities: named (amp, lt, gt, quot, apos, nbsp) and numeric
 *     (`&#NNN;`, `&#xHH;`);
 *  6. collapse all Unicode whitespace runs to one ASCII space and trim.
 */
object Html {

  private val ScriptStyle: Regex = "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val Comment: Regex     = "(?s)<!--.*?-->".r
  private val Tag: Regex         = "(?s)<[^>]*>".r
  private val Ws: Regex          = "\\s+".r
  private val NumEntity: Regex   = "&#(x[0-9a-fA-F]+|[0-9]+);".r
  private val AnchorHref: Regex =
    "(?is)<a\\b[^>]*?\\bhref\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))".r

  /** UTF-8 decode with replacement — never throws, total function of bytes. */
  def decodeUtf8(bytes: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(ByteBuffer.wrap(bytes)).toString
  }

  private def decodeEntities(s: String): String = {
    val numeric = NumEntity.replaceAllIn(s, m => {
      val body = m.group(1)
      val cp =
        try {
          if (body.charAt(0) == 'x' || body.charAt(0) == 'X')
            Integer.parseInt(body.substring(1), 16)
          else Integer.parseInt(body)
        } catch { case _: NumberFormatException => 0xFFFD }
      val safe = if (Character.isValidCodePoint(cp) && cp != 0) cp else 0xFFFD
      Regex.quoteReplacement(new String(Character.toChars(safe)))
    })
    numeric
      .replace("&nbsp;", " ")
      .replace("&quot;", "\"")
      .replace("&apos;", "'")
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&amp;", "&") // last, so `&amp;lt;` → `&lt;` (literal), not `<`
  }

  /** X1 — html bytes → normalized text. Pure; byte-identical per input. */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return null
    val raw      = decodeUtf8(html)
    val noScript = ScriptStyle.replaceAllIn(raw, " ")
    val noCom    = Comment.replaceAllIn(noScript, " ")
    val noTags   = Tag.replaceAllIn(noCom, " ")
    val decoded  = decodeEntities(noTags)
    Ws.replaceAllIn(decoded, " ").trim
  }

  /** X2 — all `<a href>` targets in document order (entity-decoded, raw otherwise). */
  def extractOutlinks(html: Array[Byte]): Seq[String] = {
    if (html == null) return null
    val raw = decodeUtf8(html)
    AnchorHref.findAllMatchIn(raw).map { m =>
      val v =
        if (m.group(2) != null) m.group(2)
        else if (m.group(3) != null) m.group(3)
        else m.group(4)
      decodeEntities(v).trim
    }.toVector
  }

  /**
   * X3 — URL normalization, pinned rules:
   *  - absolute `http(s)://` links: lowercase scheme+host, strip `#fragment`,
   *    strip trailing `/` on a bare host;
   *  - root-relative `/path`: resolved against the page url's scheme+host;
   *  - anything else (mailto:, javascript:, relative, empty): dropped (null).
   */
  def normalizeUrl(link: String, baseUrl: String): String = {
    if (link == null) return null
    val l = link.trim
    def clean(abs: String): String = {
      val noFrag  = { val i = abs.indexOf('#'); if (i >= 0) abs.substring(0, i) else abs }
      val si      = noFrag.indexOf("://")
      if (si < 0) return null
      val scheme  = noFrag.substring(0, si).toLowerCase
      if (scheme != "http" && scheme != "https") return null
      val rest    = noFrag.substring(si + 3)
      val slash   = rest.indexOf('/')
      val host    = (if (slash < 0) rest else rest.substring(0, slash)).toLowerCase
      val path    = if (slash < 0) "" else rest.substring(slash)
      if (host.isEmpty) null
      else if (path.isEmpty || path == "/") s"$scheme://$host"
      else s"$scheme://$host$path"
    }
    if (l.startsWith("http://") || l.startsWith("https://") ||
        l.startsWith("HTTP://") || l.startsWith("HTTPS://") ||
        l.toLowerCase.startsWith("http")) {
      clean(l)
    } else if (l.startsWith("/") && baseUrl != null) {
      val si = baseUrl.indexOf("://")
      if (si < 0) null
      else {
        val rest  = baseUrl.substring(si + 3)
        val slash = rest.indexOf('/')
        val hostPart = if (slash < 0) rest else rest.substring(0, slash)
        clean(baseUrl.substring(0, si).toLowerCase + "://" + hostPart + l)
      }
    } else null
  }

  // ---- Column-level surface (Scala UDFs; kept OFF filter paths so parquet
  //      pushdown survives — SURVEY.md §5.1) ----
  val extractTextUdf     = udf((b: Array[Byte]) => extractText(b))
  val extractOutlinksUdf = udf((b: Array[Byte]) => extractOutlinks(b))
  val normalizeUrlUdf    = udf((l: String, base: String) => normalizeUrl(l, base))

  def extract_text(c: Column): Column             = extractTextUdf(c)
  def extract_outlinks(c: Column): Column         = extractOutlinksUdf(c)
  def normalize_url(l: Column, base: Column): Column = normalizeUrlUdf(l, base)
}
