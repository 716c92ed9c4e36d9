package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Strings
import org.apache.spark.sql.functions._

/** String kernel queries (SURVEY.md §2.3 — minarrow src/kernels/string.rs).
  * One column per kernel over the part/orders/documents tables, exact-value
  * checked against DuckDB equivalents.
  */
object StringQueries {

  val defs: Seq[QueryDef] = Seq(

    // Scalar string transforms: case, trim family, reverse, substring,
    // lengths, pads, repeat, literal replace, concat.
    QueryDef.sql(
      "q17_string_transforms",
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_type) AS lo,
        |  substring(p_name, 2, 4) AS sub24,
        |  CAST(length(p_name) AS BIGINT) AS len_chars,
        |  CAST(strlen(p_name) AS BIGINT) AS len_bytes,
        |  reverse(p_name) AS rev,
        |  lpad(p_brand, 12, '*') AS padl,
        |  rpad(p_brand, 12, '#') AS padr,
        |  repeat(p_brand, 2) AS rep2,
        |  trim(lpad(p_name, 24, ' ')) AS trimmed,
        |  ltrim(lpad(p_name, 24, ' ')) AS ltrimmed,
        |  rtrim(rpad(p_name, 24, ' ')) AS rtrimmed,
        |  replace(p_name, 'a', '@') AS repl,
        |  p_name || '/' || p_type AS cat
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          Strings.toUpper(col("p_name")).as("up"),
          Strings.toLower(col("p_type")).as("lo"),
          Strings.substr(col("p_name"), 2, 4).as("sub24"),
          Strings.lenChars(col("p_name")).cast("long").as("len_chars"),
          Strings.byteLen(col("p_name")).cast("long").as("len_bytes"),
          Strings.reverseStr(col("p_name")).as("rev"),
          Strings.padLeft(col("p_brand"), 12, "*").as("padl"),
          Strings.padRight(col("p_brand"), 12, "#").as("padr"),
          Strings.repeatStr(col("p_brand"), 2).as("rep2"),
          Strings.trimStr(Strings.padLeft(col("p_name"), 24, " ")).as("trimmed"),
          Strings.ltrimStr(Strings.padLeft(col("p_name"), 24, " ")).as("ltrimmed"),
          Strings.rtrimStr(Strings.padRight(col("p_name"), 24, " ")).as("rtrimmed"),
          Strings.replaceStr(col("p_name"), "a", "@").as("repl"),
          Strings.concatStr(Strings.concatStr(col("p_name"), lit("/")), col("p_type")).as("cat"))
        .orderBy(col("p_partkey"))
    },

    // Predicates + positional kernels: contains/starts/ends, 0-based byte
    // find (custom FindStr0), non-overlapping count_match (custom CountMatch).
    QueryDef.sql(
      "q18_string_predicates",
      """SELECT p_partkey,
        |  contains(p_name, 'ring') AS has_ring,
        |  starts_with(p_name, 'small') AS is_small,
        |  ends_with(p_name, 'bolt') AS is_bolt,
        |  (NULLIF(instr(p_name, 'ge'), 0) - 1) AS find_ge,
        |  CAST((length(p_name) - length(replace(p_name, 'e', ''))) AS BIGINT) AS n_e,
        |  CAST((length(p_name) - length(replace(p_name, 'ol', ''))) / 2 AS BIGINT) AS n_ol
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          Strings.containsStr(col("p_name"), "ring").as("has_ring"),
          Strings.startsWithStr(col("p_name"), "small").as("is_small"),
          Strings.endsWithStr(col("p_name"), "bolt").as("is_bolt"),
          Strings.find0(col("p_name"), lit("ge")).as("find_ge"),
          Strings.countMatch(col("p_name"), lit("e")).as("n_e"),
          Strings.countMatch(col("p_name"), lit("ol")).as("n_ol"))
        .orderBy(col("p_partkey"))
    },

    // Regex kernels: match (rlike) + replace-all (string.rs:679-808,1919).
    QueryDef.sql(
      "q19_regex",
      """SELECT doc_id,
        |  regexp_matches(text, 'jo[i]n') AS has_join,
        |  regexp_replace(text, '[aeiou]+', '_', 'g') AS devoweled,
        |  CAST(length(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_words
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          Strings.regexMatch(col("text"), "jo[i]n").as("has_join"),
          Strings.regexReplace(col("text"), "[aeiou]+", "_").as("devoweled"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("n_words"))
        .orderBy(col("doc_id"))
    },

    // Aggregating string kernels: join_str (ordered concat — string.rs:1889),
    // min/max over strings (:941,:970), exact distinct count (:1068).
    QueryDef.sql(
      "q20_string_aggs",
      """SELECT p_brand,
        |  string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types,
        |  min(p_name) AS first_name,
        |  max(p_name) AS last_name,
        |  CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_names
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(
          concat_ws(",", sort_array(collect_set(col("p_type")))).as("types"),
          Strings.minStr(col("p_name")).as("first_name"),
          Strings.maxStr(col("p_name")).as("last_name"),
          Strings.countDistinctStr(col("p_name")).as("n_names"))
        .orderBy(col("p_brand"))
    },

    // cross_tabulate on a second column pair (string.rs:2034).
    QueryDef.sql(
      "q21_crosstab_orders",
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Strings.crossTabulate(Tables.orders(s, d), "o_orderpriority", "o_orderstatus", Seq("F", "O", "P"))
        .orderBy(col("o_orderpriority"))
    }
,

    // Dictionary-aware execution (minarrow dict kernels rewrite
    // unique_values, not rows — string.rs:1965): the transform runs over
    // the distinct dictionary and broadcast-joins back; the oracle applies
    // the direct expression, so equality proves the rewrite is exact.
    QueryDef.sql(
      "q66_dict_aware_transform",
      """SELECT o_orderkey, regexp_replace(o_orderpriority, '[0-9]-', '', 'g') AS prio_clean
        |FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Strings.dictAwareTransform(
          Tables.orders(s, d).filter(col("o_orderkey") < 3000)
            .select(col("o_orderkey"), col("o_orderpriority")),
          "o_orderpriority", c => regexp_replace(c, "[0-9]-", ""), "prio_clean")
        .select(col("o_orderkey"), col("prio_clean"))
        .orderBy(col("o_orderkey"))
    },

    // Unicode normalization kernels (NFC composition + diacritic strip).
    // The fixture corpus is pure ASCII (normalization is the identity on
    // it — proven by the unioned document rows), so the interesting cases
    // ride in as literals: decomposed e+◌́ / i+◌̈ sequences that NFC must
    // compose, and æ/ß/ﬁ which strip_accents must pass through. Both
    // engines implement the same Unicode canonical algorithms
    // (java.text.Normalizer vs utf8proc), which this query pins cell-exact.
    QueryDef.sql(
      "q101_unicode_norm",
      """WITH t(id, s) AS (
        |  SELECT * FROM (VALUES
        |    (1, 'e' || chr(769) || 'cole'),
        |    (2, CAST('école' AS VARCHAR)),
        |    (3, CAST('ﬁn æß' AS VARCHAR)),
        |    (4, 'Cafe' || chr(769) || ' du Mont'),
        |    (5, 'nai' || chr(776) || 've'),
        |    (6, 'plain ascii'))
        |  UNION ALL
        |  SELECT CAST(doc_id AS INT) + 100, substring(text, 1, 12)
        |  FROM documents WHERE doc_id < 3)
        |SELECT id, nfc_normalize(s) AS nfc,
        |  strip_accents(s) AS stripped,
        |  CAST(strlen(s) AS BIGINT) AS bytes_raw,
        |  CAST(strlen(nfc_normalize(s)) AS BIGINT) AS bytes_nfc
        |FROM t ORDER BY id""".stripMargin) { (s, d) =>
      import s.implicits._
      // ids 1/4/5 are DECOMPOSED (base char + combining mark, matching the
      // oracle's chr(769)/chr(776) construction) — bytes_raw must agree
      val lits = Seq(
        (1, "école"),
        (2, "école"),
        (3, "ﬁn æß"),
        (4, "Café du Mont"),
        (5, "naïve"),
        (6, "plain ascii")).toDF("id", "s")
      val docs = Tables.documents(s, d).filter(col("doc_id") < 3)
        .select((col("doc_id") + 100).cast("int").as("id"),
          substring(col("text"), 1, 12).as("s"))
      lits.unionByName(docs)
        .select(col("id"),
          Strings.nfcNormalize(col("s")).as("nfc"),
          Strings.stripAccents(col("s")).as("stripped"),
          octet_length(col("s")).cast("long").as("bytes_raw"),
          octet_length(Strings.nfcNormalize(col("s"))).cast("long").as("bytes_nfc"))
        .orderBy(col("id"))
    },

    // String extras battery — the §2.3 long tail both engines share:
    // character translation, delimiter field extraction, 1-based search,
    // capture-group regex extraction, fixed-width take from either end,
    // codepoint↔char. (DuckDB lacks initcap/overlay, so those stay
    // Spark-spec'd in StringsSpec instead of the oracle battery.)
    QueryDef.sql(
      "q117_string_extras",
      """SELECT s_suppkey,
        |  translate(s_name, '#0', '_O') AS tr,
        |  split_part(s_name, '#', 2) AS num_part,
        |  CAST(strpos(s_name, '#') AS BIGINT) AS hash_at,
        |  regexp_extract(s_name, '([A-Za-z]+)#(\d+)', 2) AS num_re,
        |  left(s_name, 8) AS l8, right(s_name, 4) AS r4,
        |  CAST(ascii(s_name) AS BIGINT) AS first_cp,
        |  chr(CAST(65 + s_suppkey % 26 AS INT)) AS letter
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .select(col("s_suppkey"),
          translate(col("s_name"), "#0", "_O").as("tr"),
          expr("split_part(s_name, '#', 2)").as("num_part"),
          instr(col("s_name"), "#").cast("long").as("hash_at"),
          regexp_extract(col("s_name"), "([A-Za-z]+)#(\\d+)", 2).as("num_re"),
          expr("left(s_name, 8)").as("l8"), expr("right(s_name, 4)").as("r4"),
          ascii(col("s_name")).cast("long").as("first_cp"),
          expr("chr(65 + s_suppkey % 26)").as("letter"))
        .orderBy(col("s_suppkey"))
    }
  )
}