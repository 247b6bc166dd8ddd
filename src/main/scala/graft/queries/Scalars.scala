package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** SURVEY §2 category H — scalar function kernels (string / date / math /
  * array / generator / JSON / map). All built-in `functions._` — codegen'd,
  * whole-stage-compatible, no UDFs on these hot paths.
  *
  * Cross-engine typing rules applied throughout: Spark int-returning
  * functions (length, year, row_number, size, …) are cast to long because
  * DuckDB's equivalents return BIGINT; libm-backed math (ln, pow) is rounded
  * because correct rounding isn't guaranteed across implementations; JSON
  * extracts are cast to concrete types (§5.3 rule 7).
  */
object Scalars {

  val queries: Seq[Q] = Seq(
    Q("h1_string_fns",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          lower(col("p_name")).as("lname"),
          upper(col("p_brand")).as("ubrand"),
          length(col("p_name")).cast(LongType).as("name_len"),
          substring(col("p_name"), 1, 8).as("name8"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          size(split(col("p_name"), " ")).cast(LongType).as("n_tokens"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
          levenshtein(col("p_brand"), lit("Brand#13")).cast(LongType)
            .as("lev"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, lower(p_name) AS lname, upper(p_brand)
                       AS ubrand,
                     length(p_name) AS name_len,
                     substring(p_name, 1, 8) AS name8,
                     concat_ws('|', p_brand, p_type) AS brand_type,
                     len(string_split(p_name, ' ')) AS n_tokens,
                     regexp_extract(p_type, '^(\w+)', 1) AS first_word,
                     regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
                     levenshtein(p_brand, 'Brand#13') AS lev
              FROM part ORDER BY p_partkey""")),

    Q("h2_date_fns",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          // DuckDB's date_trunc('day', ts) yields DATE; align types.
          date_trunc("day", col("o_orderdate")).cast("date").as("od_day"),
          year(col("o_orderdate")).cast(LongType).as("yr"),
          month(col("o_orderdate")).cast(LongType).as("mo"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
          datediff(lit("1998-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast(LongType).as("days_to_98"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     date_trunc('day', o_orderdate) AS od_day,
                     year(o_orderdate) AS yr,
                     month(o_orderdate) AS mo,
                     day(o_orderdate) AS dom,
                     date_diff('day', CAST(o_orderdate AS DATE),
                       DATE '1998-01-01') AS days_to_98,
                     epoch_us(o_orderdate) AS od_us
              FROM orders ORDER BY o_orderkey""")),

    Q("h3_math_fns",
      // spread: 13 math kernels per row over the full fact table — the
      // projection itself is the cost (h3 4.18→1.59 s with the floor)
      (s, d) => Tables.lineitemSpread(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          round(col("l_extendedprice"), 1).as("price_r1"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
          round(pow(col("l_quantity"), 2), 6).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
          round(log(col("l_extendedprice")), 6).as("price_ln"),
          pmod(col("l_orderkey"), lit(7)).as("ok_mod7"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"),
          least(col("l_tax"), col("l_discount")).as("min_rate"))
        // (l_orderkey, l_linenumber, l_suppkey) is NOT unique — order by
        // every output column for a total order (§5.3 rule 2)
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "price_r1",
          "price_ceil", "price_floor", "disc_dev", "qty_sq", "price_sqrt",
          "price_ln", "ok_mod7", "max_rate", "min_rate"),
      Some("""SELECT l_orderkey, l_linenumber, l_suppkey,
                     round(l_extendedprice, 1) AS price_r1,
                     CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
                     CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
                     round(abs(l_discount - 0.05), 4) AS disc_dev,
                     round(pow(l_quantity, 2), 6) AS qty_sq,
                     round(sqrt(l_extendedprice), 6) AS price_sqrt,
                     round(ln(l_extendedprice), 6) AS price_ln,
                     l_orderkey % 7 AS ok_mod7,
                     greatest(l_tax, l_discount) AS max_rate,
                     least(l_tax, l_discount) AS min_rate
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_suppkey, price_r1,
                       price_ceil, price_floor, disc_dev, qty_sq, price_sqrt,
                       price_ln, ok_mod7, max_rate, min_rate""")),

    // Higher-order array functions over the 64-dim embedding column. The
    // fold accumulates in double on both sides, in element order, so the
    // result is bit-stable across engines (rounded anyway).
    // Array outputs are projected to scalars (the slice through a second
    // in-order fold) — the driver's compare harness cannot sort
    // array-valued columns (round-1 ADVICE).
    Q("h4_array_fns",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).cast(LongType).as("dim"),
          element_at(col("embedding"), 1).as("e1"),
          round(expr(
            """aggregate(transform(slice(embedding, 1, 4),
               x -> cast(x as double)),
               cast(0 as double), (a, x) -> a + x)"""), 5).as("first4_sum"),
          round(expr(
            """aggregate(transform(embedding, x -> abs(cast(x as double))),
               cast(0 as double), (a, x) -> a + x)"""), 5).as("l1_norm"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, len(embedding) AS dim,
                     embedding[1] AS e1,
                     round(list_reduce(list_transform(embedding[1:4],
                       x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 5)
                       AS first4_sum,
                     round(list_reduce(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE))), (a, b) -> a + b), 5)
                       AS l1_norm
              FROM embeddings ORDER BY vec_id""")),

    // explode → word count: THE canonical Spark-Streaming-demo computation
    // in batch form (SURVEY §2 h5).
    Q("h5_explode",
      (s, d) => Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("word"),
      Some("""SELECT word, COUNT(*) AS cnt FROM (
                SELECT unnest(string_split(text, ' ')) AS word
                FROM documents)
              GROUP BY word ORDER BY word""")),

    // Positional generate: posexplode ≡ DuckDB lateral unnest over
    // generate_series (pos kept 1-based on both sides via +1 on Spark's
    // 0-based pos).
    Q("h8_posexplode",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "word")))
        .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("pos"),
          col("word"))
        .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, CAST(i AS BIGINT) AS pos,
                     string_split(text, ' ')[i] AS word
              FROM documents,
                   UNNEST(generate_series(1,
                     len(string_split(text, ' ')))) AS t(i)
              ORDER BY doc_id, pos""")),

    // Array higher-order kernel #2: position/reverse/flatten/slice
    // composition over the token array. array_position returns 0 when
    // absent in Spark; DuckDB's list_position returns NULL — coalesce.
    // Array results leave the query as '|'-joined scalars — the driver's
    // compare harness cannot sort array-valued columns (round-1 ADVICE).
    Q("h9_array_hof",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(reverse(col("toks")), 1).as("last_tok"),
          array_position(col("toks"), "the").cast(LongType).as("the_pos"),
          concat_ws("|",
            flatten(array(slice(col("toks"), 1, 2), slice(col("toks"), 3, 2))))
            .as("first4_csv"),
          concat_ws(",", array_repeat(col("lang"), 2)).as("lang2"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     string_split(text, ' ')[1] AS first_tok,
                     list_reverse(string_split(text, ' '))[1] AS last_tok,
                     CAST(COALESCE(list_position(string_split(text, ' '),
                       'the'), 0) AS BIGINT) AS the_pos,
                     array_to_string(flatten([string_split(text, ' ')[1:2],
                              string_split(text, ' ')[3:4]]), '|')
                       AS first4_csv,
                     lang || ',' || lang AS lang2
              FROM documents ORDER BY doc_id""")),

    // String kernel #2 — padding/alignment, character translation,
    // repetition, reversal (report formatting + key normalization layer).
    Q("h12_string_pad_fns",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("brand_l"),
          rpad(col("p_brand"), 12, "-").as("brand_r"),
          translate(col("p_type"), "ae", "@3").as("type_leet"),
          repeat(col("p_brand"), 2).as("brand_x2"),
          reverse(col("p_name")).as("name_rev"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     lpad(p_brand, 12, '*') AS brand_l,
                     rpad(p_brand, 12, '-') AS brand_r,
                     translate(p_type, 'ae', '@3') AS type_leet,
                     repeat(p_brand, 2) AS brand_x2,
                     reverse(p_name) AS name_rev
              FROM part ORDER BY p_partkey""")),

    // Delimiter-splitting kernel: split_part / substring_index / position /
    // left-right slicing — the field-extraction primitives for delimited
    // identifiers (both engines 1-index positions; absent delimiter → '' for
    // split_part in both).
    Q("h13_split_part",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          expr("split_part(c_name, '#', 2)").as("cust_num"),
          substring_index(col("c_name"), "#", 1).as("prefix"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          expr("left(c_name, 8)").as("l8"),
          expr("right(c_name, 3)").as("r3"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     split_part(c_name, '#', 2) AS cust_num,
                     split_part(c_name, '#', 1) AS prefix,
                     CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
                     left(c_name, 8) AS l8,
                     right(c_name, 3) AS r3
              FROM customer ORDER BY c_custkey""")),

    // printf-style formatting kernel (Spark format_string ≡ DuckDB printf —
    // same C format-spec dialect for %s / zero-padded %d). Integer and
    // string specs only: float rendering differs across libc implementations
    // and has no place in an oracle output (SURVEY §5.3).
    Q("h14_format_string",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          format_string("%s|%04d", col("p_brand"), col("p_size"))
            .as("brand_size"),
          format_string("[%-10s]", col("p_type")).as("type_padded"),
          format_string("%08d", col("p_partkey")).as("key8"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     printf('%s|%04d', p_brand, p_size) AS brand_size,
                     printf('[%-10s]', p_type) AS type_padded,
                     printf('%08d', p_partkey) AS key8
              FROM part ORDER BY p_partkey""")),

    // Array set-operation kernel: union / intersect / except between the
    // document's distinct token set and a constant stoplist — the literal
    // stopword-removal primitive (array_except IS "remove stopwords").
    // Set-valued results are sorted then CSV-joined to keep the oracle
    // output scalar (SURVEY §5.3 rule 5); DuckDB spells except/union via
    // list_filter/list_distinct compositions. The oracle coalesces its CSV
    // strings because DuckDB's array_to_string of an EMPTY list is NULL
    // while Spark's concat_ws of an empty array is ''. (Never put `--`
    // comments inside oracle SQL — Verify collapses newlines, so a line
    // comment would swallow the rest of the statement.)
    Q("h15_array_setops",
      (s, d) => {
        val stop = "the,a,of,and,to,in,is,it,for,on"
        Tables.documents(s, d)
          .withColumn("toks", array_distinct(split(col("text"), " ")))
          .withColumn("stop", split(lit(stop), ","))
          .select(col("doc_id"),
            concat_ws(",", sort_array(expr("array_except(toks, stop)")))
              .as("content_csv"),
            concat_ws(",", sort_array(expr("array_intersect(toks, stop)")))
              .as("stops_csv"),
            size(expr("array_intersect(toks, stop)")).cast("long")
              .as("n_stop"),
            expr("arrays_overlap(toks, stop)").as("has_stop"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       list_distinct(string_split(text, ' ')) AS toks,
                       string_split('the,a,of,and,to,in,is,it,for,on', ',')
                         AS stop
                FROM documents)
              SELECT doc_id,
                     coalesce(array_to_string(list_sort(list_filter(toks,
                       x -> NOT list_contains(stop, x))), ','), '')
                       AS content_csv,
                     coalesce(array_to_string(
                       list_sort(list_intersect(toks, stop)), ','), '')
                       AS stops_csv,
                     CAST(len(list_intersect(toks, stop)) AS BIGINT)
                       AS n_stop,
                     len(list_intersect(toks, stop)) > 0 AS has_stop
              FROM t ORDER BY doc_id""")),

    // Date arithmetic kernel — offsets, calendar-month math, boundary
    // alignment. add_months ≡ DuckDB `+ INTERVAL n MONTH` (both clamp to the
    // last day of month); the month-distance uses the explicit boundary
    // count formula because Spark's months_between is fractional while
    // DuckDB's date_diff counts boundaries.
    Q("h11_date_arith",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("d0"),
          date_add(to_date(col("o_orderdate")), 30).as("plus30"),
          add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
          last_day(to_date(col("o_orderdate"))).as("eom"),
          trunc(to_date(col("o_orderdate")), "month").as("som"),
          ((year(col("o_orderdate")) - 1995) * 12 +
            month(col("o_orderdate")) - 1).cast(LongType).as("months_since"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     CAST(o_orderdate AS DATE) AS d0,
                     CAST(o_orderdate AS DATE) + 30 AS plus30,
                     CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH
                       AS DATE) AS plus2m,
                     last_day(CAST(o_orderdate AS DATE)) AS eom,
                     CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                       AS DATE) AS som,
                     date_diff('month', DATE '1995-01-01',
                       CAST(o_orderdate AS DATE)) AS months_since
              FROM orders ORDER BY o_orderkey""")),

    // Bitwise kernel — and/or/xor/shifts/popcount on the integer id columns
    // (the primitive layer under SimHash Hamming distance and LSH banding).
    // DuckDB's `^` is exponentiation, so the oracle spells xor().
    Q("h10_bitwise_fns",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          col("event_id").bitwiseAND(lit(255L)).as("lo8"),
          col("event_id").bitwiseOR(lit(4096L)).as("or4k"),
          col("event_id").bitwiseXOR(col("user_id")).as("eid_xor_uid"),
          shiftleft(col("user_id"), 3).as("uid_shl3"),
          shiftright(col("event_id"), 2).as("eid_shr2"),
          bit_count(col("event_id")).cast(LongType).as("eid_bits"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     event_id & 255 AS lo8,
                     event_id | 4096 AS or4k,
                     xor(event_id, user_id) AS eid_xor_uid,
                     user_id << 3 AS uid_shl3,
                     event_id >> 2 AS eid_shr2,
                     CAST(bit_count(event_id) AS BIGINT) AS eid_bits
              FROM events ORDER BY event_id""")),

    Q("h6_json_fns",
      // spread: two JSON parses per row dominate (h6 2.27→0.68 s floored)
      (s, d) => Tables.eventsSpread(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k_path"),
          from_json(col("props"), StructType.fromDDL("k BIGINT"))
            .getField("k").as("k_schema"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS k_path,
                     CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS k_schema
              FROM events ORDER BY event_id""")),

    // Map kernel — maps never appear in oracle output (iteration order is
    // engine-specific, §5.3 rule 5); project to scalars + sorted arrays.
    Q("h7_map_fns",
      (s, d) => {
        val m = map_from_arrays(
          array(lit("a"), lit("b")),
          array(col("user_id"), col("event_id")))
        Tables.events(s, d)
          .select(col("event_id"),
            element_at(m, "a").as("va"),
            size(map_keys(m)).cast(LongType).as("nkeys"),
            concat_ws(",", sort_array(map_keys(m))).as("keys_csv"),
            array_contains(map_keys(m), "a").as("has_a"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id AS va, CAST(2 AS BIGINT) AS nkeys,
                     'a,b' AS keys_csv, TRUE AS has_a
              FROM events ORDER BY event_id"""))
  )
}
