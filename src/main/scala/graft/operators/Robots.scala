package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt parsing and the RFC 9309 allow/disallow evaluation — the
  * crawl-GOVERNANCE piece of the ingest family (SURVEY.md §2.6
  * extensions): a compliant crawl pipeline must be able to answer "was
  * this fetch allowed?" retroactively over billions of (host, path)
  * pairs, and a crawl audit wants the rule census itself.
  *
  * Scale shape: robots bodies are parsed ONCE per host (the robots
  * corpus is #hosts-sized — orders of magnitude smaller than the page
  * corpus), the per-agent rule set is broadcast, and the verdict pass
  * over the page corpus is map-only after the broadcast join: paths
  * never shuffle, patterns compile once per partition.
  */
object Robots {

  /** One allow/disallow rule: `pattern` uses the REP wildcard grammar
    * (`*` matches any run, trailing `$` anchors the path end,
    * otherwise prefix match). */
  private[graft] case class Rule(allow: Boolean, pattern: String)

  /** One RFC 9309 group: the user-agent product tokens it names (a
    * run of consecutive `User-agent` lines) and its rules in file
    * order. */
  private[graft] case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Line-based robots.txt parse (RFC 9309 §2.2): `#` comments strip,
    * keys are case-insensitive, a `User-agent` line after rules
    * starts a NEW group while consecutive `User-agent` lines share
    * one, unknown directives (crawl-delay, host, ...) are tolerated
    * inside a group without ending it, rules before any `User-agent`
    * line have no group and drop, an EMPTY Disallow/Allow value
    * matches nothing (the RFC's "allow everything" idiom) and drops.
    * Sitemap lines are global — returned separately. Never throws:
    * a garbage line is skipped, a garbage file parses to no groups
    * (= no restrictions, exactly the no-robots default). */
  private[graft] def parse(txt: String): (Seq[Group], Seq[String]) = {
    if (txt == null) return (Seq.empty, Seq.empty)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def close(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inRules = false
    }
    txt.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (line.nonEmpty && c > 0) {
        val key = line.take(c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = line.drop(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) close()
            if (v.nonEmpty)
              agents :+= v.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            if (agents.nonEmpty) {
              inRules = true
              if (v.nonEmpty) rules :+= Rule(key == "allow", v)
            }
          case "sitemap" => if (v.nonEmpty) sitemaps += v
          case _ => if (agents.nonEmpty) inRules = true
        }
      }
    }
    close()
    (groups.toSeq, sitemaps.toSeq)
  }

  /** The rule set governing `agent` (RFC 9309 §2.2.1): every group
    * naming the agent's product token (case-insensitive, exact token)
    * merges, else every `*` group merges, else no rules (allowed).
    * None vs Some(empty) is not distinguished — both mean "no
    * matching rule ever disallows". */
  private[graft] def selectRules(groups: Seq[Group],
      agent: String): Seq[Rule] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact
      else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** REP pattern → anchored regex (RFC 9309 §2.2.3): `*` matches any
    * run, a trailing `$` anchors the end, everything else is literal
    * prefix match. */
  private[graft] def patternRegex(pattern: String): String = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    "^" + p.split("\\*", -1)
      .map(s => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
      .mkString(".*") + (if (anchored) "$" else "")
  }

  /** RFC 9309 §2.2.2 evaluation: among the rules whose pattern
    * matches the path, the LONGEST pattern (octet length) wins; on a
    * length tie Allow wins; no match → allowed. `compiled` lets a
    * partition-long evaluation reuse compiled patterns. */
  private[graft] def isAllowed(rules: Seq[Rule], path: String,
      compiled: scala.collection.mutable.Map[String,
        java.util.regex.Pattern] = scala.collection.mutable.Map.empty)
      : Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      val re = compiled.getOrElseUpdate(r.pattern,
        java.util.regex.Pattern.compile(patternRegex(r.pattern)))
      if (re.matcher(path).find()) {
        val len = r.pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = r.allow }
        else if (len == bestLen && r.allow) bestAllow = true
      }
    }
    bestAllow
  }

  /** Rule CENSUS over a robots corpus: one row per parsed rule
    * (host, group index, the group's agents joined with `,`, allow,
    * pattern, rule index in file order) plus one `sitemap` row per
    * Sitemap line (allow NULL). The audit view of what each host
    * declares. Map-only. */
  def robotsRules(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame = {
    import robots.sparkSession.implicits._
    robots.select(col(hostCol).cast("string").as("host"),
        col(txtCol).cast("string").as("txt"))
      .as[(String, String)]
      .flatMap { case (host, txt) =>
        val (groups, sitemaps) = parse(txt)
        groups.zipWithIndex.flatMap { case (g, gi) =>
          g.rules.zipWithIndex.map { case (r, ri) =>
            (host, gi.toLong, g.agents.mkString(","),
              if (r.allow) "allow" else "disallow", r.pattern,
              ri.toLong)
          }
        } ++ sitemaps.map(sm =>
          (host, -1L, "", "sitemap", sm, -1L))
      }
      .toDF("host", "grp", "agents", "directive", "pattern", "rule")
  }

  /** Sitemap XML → one row per entry — the crawl-frontier companion
    * to the robots `Sitemap:` lines [[robotsRules]] surfaces: `<url>`
    * blocks of a urlset and `<sitemap>` blocks of a sitemapindex
    * (kind `url` vs `sitemap` — an index points at MORE sitemaps, a
    * frontier walk recurses on those rows), each with its
    * entity-decoded `<loc>` (ampersands in query URLs arrive as
    * `&amp;` by the XML spec) and the optional `<lastmod>` /
    * `<changefreq>` / `<priority>` fields (absent → NULL; a
    * non-numeric priority reads NULL, never a throw — ANSI
    * `try_cast` semantics via a digits-only gate). Pure codegen'd
    * regex + explode — no XML DOM (crawl sitemaps are malformed as
    * often as crawl HTML; a block missing its `<loc>` yields a NULL
    * loc row to count, not an exception), map-only, narrow. CDATA
    * sections and exotic namespaces are out of scope — documented,
    * not guessed at. */
  def sitemapEntries(df: DataFrame, idCol: String,
      xmlCol: String): DataFrame = {
    def field(block: org.apache.spark.sql.Column, tag: String) = {
      val v = regexp_extract(block,
        s"(?is)<$tag[^>]*>\\s*(.*?)\\s*</$tag>", 1)
      when(v =!= "", v)
    }
    def entries(kind: String, blockTag: String) =
      df.select(col(idCol), lit(kind).as("kind"),
          explode(regexp_extract_all(col(xmlCol),
            lit(s"(?is)<$blockTag(?:\\s[^>]*)?>(.*?)</$blockTag>"),
            lit(1))).as("block"))
        .select(col(idCol), col("kind"),
          graft.functions.TextFunctions.decodeEntities(
            field(col("block"), "loc")).as("loc"),
          field(col("block"), "lastmod").as("lastmod"),
          field(col("block"), "changefreq").as("changefreq"),
          when(field(col("block"), "priority")
            .rlike("^[0-9]*\\.?[0-9]+$"),
            field(col("block"), "priority")).cast("double")
            .as("priority"))
    entries("url", "url").unionByName(entries("sitemap", "sitemap"))
  }

  /** The VERDICT pass: every (host, path) row of `paths` gains
    * `allowed` — evaluated for `agent` against that host's robots
    * body under the RFC 9309 longest-match rule. Hosts absent from
    * the robots corpus (or with unparseable bodies) allow everything,
    * the no-robots default. The per-host rule sets are BROADCAST
    * (the robots side is #hosts-sized); the page corpus stays where
    * it is — no shuffle, patterns compiled once per partition. */
  def robotsAllowed(robots: DataFrame, hostCol: String, txtCol: String,
      paths: DataFrame, idCol: String, pHostCol: String,
      pathCol: String, agent: String): DataFrame = {
    import paths.sparkSession.implicits._
    val rules = robots
      .select(col(hostCol).cast("string").as("host"),
        col(txtCol).cast("string").as("txt"))
      .as[(String, String)]
      .map { case (host, txt) =>
        (host, selectRules(parse(txt)._1, agent)
          .map(r => (r.allow, r.pattern)))
      }
      .toDF("host", "rules")
    paths
      .select(col(idCol).cast("long").as("id"),
        col(pHostCol).cast("string").as("host"),
        col(pathCol).cast("string").as("path"))
      .join(broadcast(rules), Seq("host"), "left")
      .as[(String, Long, String, Option[Seq[(Boolean, String)]])]
      .mapPartitions { it =>
        val compiled = scala.collection.mutable.Map.empty[String,
          java.util.regex.Pattern]
        it.map { case (host, id, path, rs) =>
          val rules = rs.getOrElse(Seq.empty)
            .map { case (a, p) => Rule(a, p) }
          (id, host, path, isAllowed(rules, path, compiled))
        }
      }
      .toDF(idCol, pHostCol, pathCol, "allowed")
  }
}
