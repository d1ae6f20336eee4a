package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet, Statement}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.JdbcSource

/** S9 spec: the partitioned scan drives a stub JDBC stack (dynamic proxies
  * over the real java.sql interfaces — no driver jar needed offline),
  * which records every SQL statement it serves so the tests can assert
  * the SCAN SHAPE (stripe predicates, projection pushdown, one connection
  * per partition) as well as the data.
  */
object StubJdbc {
  import scala.jdk.CollectionConverters._

  // (columns, rows) per table — static so executor threads in local mode
  // reach the same registry after closure serialization
  val tables = new java.util.concurrent.ConcurrentHashMap[String, (Seq[String], Seq[Seq[Any]])]()
  val servedSql = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val openedConnections = new java.util.concurrent.atomic.AtomicInteger(0)
  val openConnections = new java.util.concurrent.atomic.AtomicInteger(0)

  def reset(): Unit = {
    tables.clear(); servedSql.clear()
    openedConnections.set(0); openConnections.set(0)
  }
  def served: Seq[String] = servedSql.iterator().asScala.toSeq

  /** Tiny SQL interpreter for exactly the statements JdbcSource emits:
    * `SELECT c1, c2 FROM t [WHERE col >= a AND col < b | col >= a | col < b]`.
    */
  private def run(sql: String): (Seq[String], Seq[Seq[Any]]) = {
    servedSql.add(sql)
    val m = """SELECT (.+) FROM (\S+)(?: WHERE (.+))?""".r
    sql match {
      case m(colList, tname, where) =>
        val (allCols, rows) = Option(tables.get(tname))
          .getOrElse(throw new java.sql.SQLException(s"no such table $tname"))
        val wanted = colList.split(",").map(_.trim).toSeq
        val keep: Seq[Any] => Boolean = Option(where) match {
          case None => _ => true
          case Some(w) =>
            val cond = """(\S+) (>=|<) (-?\d+)""".r
            val clauses = cond.findAllMatchIn(w).map { c =>
              val i = allCols.indexOf(c.group(1))
              val bound = c.group(3).toLong
              val op = c.group(2)
              (r: Seq[Any]) => {
                val v = r(i).asInstanceOf[Number].longValue
                if (op == ">=") v >= bound else v < bound
              }
            }.toSeq
            r => clauses.forall(_(r))
        }
        val idxs = wanted.map(allCols.indexOf)
        (wanted, rows.filter(keep).map(r => idxs.map(r)))
    }
  }

  private def proxy[T](iface: Class[T])(pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, method: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          pf.applyOrElse((method.getName, a),
            (_: (String, Array[AnyRef])) => method.getReturnType match {
              case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
              case java.lang.Void.TYPE => null
              case _ => null
            })
        }
      }).asInstanceOf[T]

  private def resultSet(cols: Seq[String], rows: Seq[Seq[Any]]): ResultSet = {
    var cursor = -1
    var nullFlag = false
    def cell(args: Array[AnyRef]): Any = {
      val v = args(0) match {
        case i: Integer => rows(cursor)(i - 1)
        case name: String => rows(cursor)(cols.indexOf(name))
      }
      nullFlag = v == null
      v
    }
    proxy(classOf[ResultSet]) {
      case ("next", _) =>
        cursor += 1
        java.lang.Boolean.valueOf(cursor < rows.size)
      case ("wasNull", _) => java.lang.Boolean.valueOf(nullFlag)
      case ("getLong", a) => cell(a) match {
        case null => java.lang.Long.valueOf(0L)
        case n: Number => java.lang.Long.valueOf(n.longValue)
      }
      case ("getInt", a) => cell(a) match {
        case null => Integer.valueOf(0)
        case n: Number => Integer.valueOf(n.intValue)
      }
      case ("getDouble", a) => cell(a) match {
        case null => java.lang.Double.valueOf(0.0)
        case n: Number => java.lang.Double.valueOf(n.doubleValue)
      }
      case ("getString", a) => cell(a).asInstanceOf[AnyRef]
      case ("getTimestamp", a) => cell(a).asInstanceOf[AnyRef]
      case ("close", _) => null
    }
  }

  private def statement(): Statement =
    proxy(classOf[Statement]) {
      case ("executeQuery", args) =>
        val (cols, rows) = run(args(0).asInstanceOf[String])
        resultSet(cols, rows)
      case ("close", _) => null
    }

  /** The injected factory: serializable, captures nothing live. */
  class Factory extends JdbcSource.ConnectionFactory {
    override def apply(): Connection = {
      openedConnections.incrementAndGet()
      openConnections.incrementAndGet()
      proxy(classOf[Connection]) {
        case ("createStatement", _) => statement()
        case ("close", _) => openConnections.decrementAndGet(); null
      }
    }
  }
}

class JdbcSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("currency", StringType),
    StructField("rate", DoubleType)))

  private def seed(n: Int): Unit = {
    StubJdbc.reset()
    StubJdbc.tables.put("rates",
      (Seq("id", "currency", "rate", "secret_col"),
        (0 until n).map(i => Seq[Any](i.toLong, s"C$i", i / 100.0, "hidden"))))
  }

  test("S9: unpartitioned scan reads the whole table through one connection") {
    seed(7)
    // single action: every extra action re-runs the scan (fresh
    // connections by design), which would confound the accounting below
    val rows = JdbcSource.read(spark, new StubJdbc.Factory, "rates", schema)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 7)
    assert(rows.head == org.apache.spark.sql.Row(0L, "C0", 0.0))
    assert(StubJdbc.openedConnections.get() == 1)
    assert(StubJdbc.openConnections.get() == 0, "connection leaked")
  }

  test("S9: partitioned scan stripes the table, every row exactly once") {
    seed(100)
    val df = JdbcSource.read(spark, new StubJdbc.Factory, "rates", schema,
      partitionColumn = Some("id"), lowerBound = 0, upperBound = 100,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    val ids = df.collect().map(_.getLong(0)) // single action
    assert(ids.length == 100)
    assert(ids.distinct.length == 100) // no stripe overlap
    assert(StubJdbc.openedConnections.get() == 4) // one connection per task
    assert(StubJdbc.openConnections.get() == 0)
    assert(StubJdbc.served.size == 4)
    assert(StubJdbc.served.count(_.contains("WHERE")) == 4)
  }

  test("S9: stripe edges are unbounded — out-of-range rows never dropped") {
    seed(0)
    StubJdbc.tables.put("rates",
      (Seq("id", "currency", "rate", "secret_col"),
        Seq(Seq[Any](-50L, "LOW", 1.0, "x"), Seq[Any](500L, "HIGH", 2.0, "x"),
          Seq[Any](10L, "MID", 3.0, "x"))))
    val df = JdbcSource.read(spark, new StubJdbc.Factory, "rates", schema,
      partitionColumn = Some("id"), lowerBound = 0, upperBound = 20,
      numPartitions = 3)
    assert(df.count() == 3, "first/last stripes must be unbounded")
  }

  test("S9: projection pushes down — only schema columns appear in the SQL") {
    seed(3)
    JdbcSource.read(spark, new StubJdbc.Factory, "rates", schema).count()
    assert(StubJdbc.served.nonEmpty)
    assert(StubJdbc.served.forall(!_.contains("secret_col")),
      s"unprojected column read: ${StubJdbc.served}")
    assert(StubJdbc.served.forall(_.startsWith("SELECT id, currency, rate ")))
  }

  test("S9: SQL NULL surfaces as Spark null via wasNull") {
    StubJdbc.reset()
    StubJdbc.tables.put("rates",
      (Seq("id", "currency", "rate", "secret_col"),
        Seq(Seq[Any](1L, null, 0.5, "x"))))
    val r = JdbcSource.read(spark, new StubJdbc.Factory, "rates", schema).head()
    assert(r.getLong(0) == 1L)
    assert(r.isNullAt(1))
  }
}
