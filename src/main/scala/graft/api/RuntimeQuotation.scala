package graft.api

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** Runtime quotation — the reference's `RuntimeCompiler` path
  * (emma-language compiler/RuntimeCompiler.scala:28-53): quoted programs
  * compiled at RUNTIME rather than by scalac at build time, which is what
  * makes the comprehension front-end usable from a REPL, a notebook, or
  * any host that assembles pipeline source dynamically.
  *
  * Spark-first shape: the snippet is compiled by the in-JVM Scala compiler
  * (`scala.tools.nsc`, shipped in the Spark distribution's scala-compiler
  * jar — no extra dependency) into REAL class files, which are jarred and
  * handed to `SparkSession.addArtifact` — the session-scoped dynamic-code
  * channel (Spark 4 isolates SQL-execution classloaders per session, so a
  * bare `sparkContext.addJar` never reaches SQL tasks) — so executors can
  * deserialize the quoted program's lambdas inside tasks. (A `ToolBox`
  * would be simpler but compiles into an in-memory
  * classloader Spark's task deserializer cannot see.) Blackbox macros
  * expand during this compilation exactly as at build time, so
  * `comprehensions.onSpark { for ... }` inside a runtime snippet derives
  * the same equi-join plans as compiled code, and macro aborts (e.g. a
  * genuinely dependent generator) surface as compile errors at QUOTE time,
  * never on the cluster.
  *
  * Typical use compiles a function so the caller can inject live bindings:
  *
  * {{{
  * val pipeline = RuntimeQuotation.compile[SparkSession => DataFrame]("""
  *   (s0: org.apache.spark.sql.SparkSession) => {
  *     implicit val spark = s0; import spark.implicits._
  *     import graft.api._, graft.api.comprehensions.onSpark
  *     ...
  *     onSpark { for { x <- xs; y <- ys; if kx(x) == ky(y) } yield ... }.toDF
  *   }""")
  * pipeline(spark)
  * }}}
  */
object RuntimeQuotation {

  private lazy val outDir: Path = {
    val d = Files.createTempDirectory("graft_rtq_classes")
    d.toFile.deleteOnExit()
    d
  }
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Last jar handed to addJar — debug/spec hook. */
  private[graft] var lastJar: Option[Path] = None

  /** Number of ACTUAL scalac runs (cache misses) — spec/telemetry hook. */
  private[graft] val compilations = new java.util.concurrent.atomic.AtomicInteger(0)

  /** A compiled snippet, keyed by source hash: re-submitting identical
    * source skips the in-JVM compiler entirely (~1-1.5 s per submission —
    * the REPL/notebook serving story; the reference's RuntimeCompiler
    * instances reuse a codegen dir the same way,
    * emma-language compiler/RuntimeCompiler.scala:28-53). The evaluation
    * entry point still runs per submission — caching covers COMPILATION,
    * not the snippet's effects. */
  private final case class Compiled(cls: String, dir: Path, jar: Path,
      // sessions this jar is already registered with — a cache hit from a
      // NEW session must still ship the jar there. WeakHashMap keyed by the
      // session object itself (SparkSession has identity equals): a
      // collected session's entry vanishes, so a later session can never
      // alias a reused identity hash and silently skip registration
      registered: java.util.WeakHashMap[SparkSession, java.lang.Boolean])
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Compiled]()

  private def sourceHash(code: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(code.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Parse, typecheck (expanding macros), compile, register the resulting
    * classes with the Spark context, and evaluate; the result is cast to
    * `T`. Compilation errors raise `RuntimeQuotationError` carrying the
    * compiler messages. Identical source (byte-for-byte) reuses the cached
    * class files and jar — only registration and evaluation re-run.
    *
    * DRIVER-side semantics match the uncached path: every submission
    * instantiates through a FRESH classloader over the cached class-file
    * dir, so snippet-internal mutable statics (an `object` counter defined
    * in the snippet) and static-initializer effects run per submission,
    * never shared across identical re-submissions. EXECUTOR-side the jar
    * registers once per session, so executor statics are per (session,
    * snippet) — keep executor-visible state out of snippet statics. */
  def compile[T](code: String)(implicit spark: SparkSession): T = synchronized {
    val key = sourceHash(code)
    val entry = cache.get(key) match {
      case c: Compiled => c
      case null =>
        val c = compileNow(code)
        cache.put(key, c)
        c
    }
    register(entry, spark)
    // fresh per submission; NOT closed — the snippet's classes (and its
    // lambdas inside running plans) stay loadable for the session's life
    val loader = new java.net.URLClassLoader(
      Array(entry.dir.toUri.toURL), getClass.getClassLoader)
    loader.loadClass(entry.cls).getDeclaredConstructor().newInstance()
      .asInstanceOf[java.util.function.Supplier[Any]].get().asInstanceOf[T]
  }

  private def compileNow(code: String): Compiled = {
    val n = counter.incrementAndGet()
    compilations.incrementAndGet()
    val cls = s"GraftRtq$n"
    // each snippet compiles into its OWN directory: jars stay one-snippet
    // sized (a shared dir would make jar N re-ship all N-1 predecessors)
    val snippetDir = Files.createDirectories(outDir.resolve(s"rtq$n"))
    // a Supplier wrapper gives the snippet an evaluation entry point that
    // needs no scala-reflect at load time
    val src = s"class $cls extends java.util.function.Supplier[Any] {\n" +
      s"  override def get(): Any = {\n$code\n  }\n}\n"
    val srcFile = snippetDir.resolve(s"$cls.scala")
    Files.writeString(srcFile, src)

    val settings = new scala.tools.nsc.Settings()
    settings.usejavacp.value = true // forked JVMs carry the full classpath
    settings.outputDirs.setSingleOutput(snippetDir.toString)
    val reporter = new scala.tools.nsc.reporters.StoreReporter(settings)
    val global = new scala.tools.nsc.Global(settings, reporter)
    new global.Run().compile(List(srcFile.toString))
    if (reporter.hasErrors)
      throw new RuntimeQuotationError(reporter.infos.toSeq
        .filter(_.severity == reporter.ERROR)
        .map(i => s"${i.pos.showError(i.msg)}").mkString("\n"))

    val jar = jarOf(snippetDir, n)
    lastJar = Some(jar)
    Compiled(cls, snippetDir, jar,
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])
  }

  /** Ship the classes the way spark-shell does: executors fetch the jar
    * before deserializing tasks, so the snippet's lambdas resolve there.
    * Spark 4 isolates SQL-execution classloaders per session (artifact
    * isolation) by default, so the jar must go through the SESSION's
    * artifact manager — a bare sparkContext.addJar lands in the default
    * state that SQL tasks no longer see. When the session was created
    * with `spark.sql.artifact.isolation.enabled=false` (the Bench/Verify
    * driver surface), the classic context channel is the ROBUST one: its
    * file-server registration lives for the SparkContext lifetime,
    * immune to the per-clone artifact-store cleanup that streaming
    * queries' cloned sessions can trigger mid-run (observed as a flaky
    * "Stream .../rtqN.jar was not found" in later, unrelated queries).
    * Idempotent per live session: a cache hit from the same session skips
    * the round-trip entirely (compile() is synchronized, so the weak map
    * needs no extra locking). */
  private def register(entry: Compiled, spark: SparkSession): Unit = {
    if (entry.registered.put(spark, java.lang.Boolean.TRUE) == null) {
      lastJar = Some(entry.jar)
      val isolated = spark.conf
        .get("spark.sql.artifact.isolation.enabled", "true").toBoolean
      if (isolated) spark.addArtifact(entry.jar.toString)
      else spark.sparkContext.addJar(entry.jar.toString)
    }
  }

  private def jarOf(dir: Path, n: Int): Path = {
    // the jar lives inside the snippet's own class dir (already
    // deleteOnExit) — a fresh temp dir per compile would leak one
    // directory per snippet for the life of the machine
    val jarPath = dir.resolve(s"rtq$n.jar")
    val out = new java.util.jar.JarOutputStream(
      Files.newOutputStream(jarPath))
    val walk = Files.walk(dir)
    try {
      walk.filter(_.toString.endsWith(".class")).forEach { p =>
        out.putNextEntry(new java.util.zip.ZipEntry(dir.relativize(p).toString))
        out.write(Files.readAllBytes(p))
        out.closeEntry()
      }
    } finally { walk.close(); out.close() }
    jarPath
  }
}

/** Compilation failure of a runtime-quoted snippet (carries the compiler
  * diagnostics, including comprehension-macro aborts). */
final class RuntimeQuotationError(msg: String) extends RuntimeException(msg)
