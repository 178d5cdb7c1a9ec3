package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.{ExactNum, MySqlCoerce, StrCmp}
import org.apache.spark.sql.functions._

/** Scalar-expression parity — SURVEY.md §2.8: the reference's complete
  * function surface (arithmetic, comparison, logic, control, predicates,
  * string) with MySQL semantics where they differ from Spark defaults:
  * int `/` int yields double (`builtin_arithmetic.go:471` casts to real),
  * division by NULL/zero yields NULL (guarded with nullif), LENGTH counts
  * BYTES (`builtin_string.go:128`), tri-valued NULL logic throughout.
  */
object Expressions extends QueryModule {

  override val queries: Seq[Q] = Seq(

    // Arithmetic: + - * / with int and real paths; MySQL true division.
    Q("expr_arith",
      (s, d) => Tables.load(s, d, "part").select(
        col("p_partkey"),
        (col("p_size") + 1).as("add_i"),
        (col("p_size") - 2).as("sub_i"),
        (col("p_size") * 3).as("mul_i"),
        (col("p_size") / 4).as("div_ii"),
        ExactNum.round4(col("p_retailprice") / col("p_size")).as("div_r"),
        (col("p_partkey") / nullif(col("p_size") - col("p_size"), lit(0)))
          .as("div_by_zero"),
        (-col("p_size")).as("neg")),
      Some("""SELECT p_partkey, p_size + 1 AS add_i, p_size - 2 AS sub_i,
                     p_size * 3 AS mul_i, p_size / 4 AS div_ii,
                     (round((p_retailprice / p_size) * 10000) / 10000.0) AS div_r,
                     p_partkey / nullif(p_size - p_size, 0) AS div_by_zero,
                     -p_size AS neg
              FROM part""")),

    // Comparison operators incl. NULL operands (tri-valued).
    Q("expr_compare",
      (s, d) => Tables.load(s, d, "part").select(
        col("p_partkey"),
        (col("p_size") === 25).as("eq"),
        (col("p_size") =!= 25).as("ne"),
        (col("p_size") < 25).as("lt"),
        (col("p_size") <= 25).as("le"),
        (col("p_size") > 25).as("gt"),
        (col("p_size") >= 25).as("ge"),
        (nullif(col("p_size"), lit(25)) < 25).as("lt_null")),
      Some("""SELECT p_partkey, p_size = 25 AS eq, p_size != 25 AS ne,
                     p_size < 25 AS lt, p_size <= 25 AS le, p_size > 25 AS gt,
                     p_size >= 25 AS ge, nullif(p_size, 25) < 25 AS lt_null
              FROM part""")),

    // AND / OR / NOT with NULL propagation (NULL AND TRUE = NULL,
    // NULL OR TRUE = TRUE — `expression/builtin_op.go:383`).
    Q("expr_logic",
      (s, d) => Tables.load(s, d, "part").select(
        col("p_partkey"),
        (col("p_size") > 10 && col("p_size") < 40).as("band"),
        (col("p_size") < 5 || col("p_size") > 45).as("tails"),
        (!(col("p_size") === 25)).as("noteq"),
        (nullif(col("p_size"), lit(25)) > 10 && col("p_size") > 0)
          .as("null_and"),
        (nullif(col("p_size"), lit(25)) > 10 || lit(true)).as("null_or")),
      Some("""SELECT p_partkey,
                     (p_size > 10 AND p_size < 40) AS band,
                     (p_size < 5 OR p_size > 45) AS tails,
                     NOT (p_size = 25) AS noteq,
                     (nullif(p_size, 25) > 10 AND p_size > 0) AS null_and,
                     (nullif(p_size, 25) > 10 OR TRUE) AS null_or
              FROM part""")),

    // Control: IF / IFNULL (`expression/builtin_control.go:299`).
    Q("expr_control",
      (s, d) => Tables.load(s, d, "part").select(
        col("p_partkey"),
        when(col("p_size") > 25, "big").otherwise("small").as("sz"),
        coalesce(
          when(col("p_size") > 25, lit(null)).otherwise(col("p_brand")),
          lit("dflt")).as("ifn")),
      Some("""SELECT p_partkey,
                     CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS sz,
                     coalesce(CASE WHEN p_size > 25 THEN NULL ELSE p_brand END,
                              'dflt') AS ifn
              FROM part""")),

    // Predicates: IN (list), BETWEEN (rewritten >= AND <= in the
    // reference, `expression_rewriter.go:321`), IS NULL, and the ROW
    // comparison `(a,b) < (c,d)` (reference `ast.RowFunc`,
    // `expression/builtin.go:361`, rewritten to a lexicographic
    // comparison chain in `planner/core/expression_rewriter.go`) —
    // expressed Spark-first as a struct comparison, which Catalyst
    // compares field-wise in declaration order, exactly the rewrite the
    // reference performs.
    Q("expr_predicates",
      (s, d) => Tables.load(s, d, "part").select(
        col("p_partkey"),
        col("p_size").isin(1, 5, 10, 25).as("in_list"),
        col("p_size").between(10, 20).as("btw"),
        nullif(col("p_size"), lit(25)).isNull.as("is_null"),
        (struct(col("p_size"), col("p_partkey")) <
          struct(lit(15), lit(1000L))).as("row_lt"),
        (struct(col("p_brand"), col("p_size")) >=
          struct(lit("Brand#23"), lit(30))).as("row_ge")),
      Some("""SELECT p_partkey, p_size IN (1, 5, 10, 25) AS in_list,
                     p_size BETWEEN 10 AND 20 AS btw,
                     nullif(p_size, 25) IS NULL AS is_null,
                     row(p_size, p_partkey) < row(15, 1000) AS row_lt,
                     row(p_brand, p_size) >= row('Brand#23', 30) AS row_ge
              FROM part""")),

    // String: LENGTH (MySQL counts BYTES), OCTET_LENGTH, STRCMP (custom
    // codegen'd Catalyst expression, graft.functions.StrCmp).
    Q("expr_string",
      (s, d) => {
        StrCmp.register(s)
        Tables.load(s, d, "part").select(
          col("p_partkey"),
          octet_length(col("p_name")).as("byte_len"),
          length(col("p_name")).as("char_len"),
          StrCmp.strcmp(col("p_name"), col("p_brand")).as("cmp_brand"))
      },
      Some("""SELECT p_partkey,
                     octet_length(encode(p_name)) AS byte_len,
                     length(p_name) AS char_len,
                     CASE WHEN p_name < p_brand THEN -1
                          WHEN p_name = p_brand THEN 0 ELSE 1 END AS cmp_brand
              FROM part""")),

    // MySQL implicit string→number coercion: longest numeric prefix,
    // 0 when none (`types/convert.go` StrToFloat) — via
    // graft.functions.MySqlCoerce (regexp prefix + cast, codegen'd).
    Q("expr_coercion",
      (s, d) => {
        val df = Tables.load(s, d, "part").select(
          col("p_partkey"),
          concat(col("p_size").cast("string"), lit("."),
            (col("p_partkey") % 10).cast("string"), lit("e1x")).as("s1"),
          col("p_name").as("s2"))
        df.select(col("p_partkey"),
          MySqlCoerce.toDouble(col("s1")).as("v1"),
          MySqlCoerce.toDouble(col("s2")).as("v2"),
          MySqlCoerce.toLong(col("s1")).as("v1_int"))
      },
      Some(s"""WITH src AS (
                SELECT p_partkey,
                       CAST(p_size AS VARCHAR) || '.' ||
                       CAST(p_partkey % 10 AS VARCHAR) || 'e1x' AS s1,
                       p_name AS s2
                FROM part),
              ex AS (
                SELECT p_partkey,
                       regexp_extract(s1,
                         '${MySqlCoerce.NumPrefix}', 1) AS r1,
                       regexp_extract(s2,
                         '${MySqlCoerce.NumPrefix}', 1) AS r2
                FROM src)
              SELECT p_partkey,
                     CASE WHEN r1 = '' THEN 0.0 ELSE CAST(r1 AS DOUBLE) END AS v1,
                     CASE WHEN r2 = '' THEN 0.0 ELSE CAST(r2 AS DOUBLE) END AS v2,
                     -- round, not TRUNC: integer context rounds half
                     -- away from zero per the reference's
                     -- floatStrToIntStr (MySqlCoerce.toLong), and at
                     -- integer scale DuckDB's round equals Spark's
                     -- bit-for-bit (the ExactNum.cents argument)
                     CAST(round(CASE WHEN r1 = '' THEN 0.0 ELSE CAST(r1 AS DOUBLE) END) AS BIGINT) AS v1_int
              FROM ex"""))
  )
}
