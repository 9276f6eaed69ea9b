package graft.api

import scala.annotation.StaticAnnotation
import scala.language.experimental.macros
import scala.reflect.macros.whitebox

/** Carrier for an inlinable helper def's SOURCE TEXT plus the import
  * statements of its defining unit (newline-joined; used to reconstruct
  * definition-site name resolution at a foreign splice site). Written by
  * the [[lib]] macro annotation; read back by `comprehensions.onSpark`
  * (static-annotation literal arguments are pickled with the symbol, so
  * both survive separate compilation runs). Not meant to be written by
  * hand. */
final class graftSrc(val src: String, val imports: String) extends StaticAnnotation

/** Mirror of the reference's `@emma.lib` (emma-language
  * compiler/lib/Lib.scala:40-55, which inlines ANY annotated def's AST
  * into quoted programs before deriving — the whole emma-lib module is
  * consumed that way). Marking a DataBag-building helper `def` with
  * `@lib` makes it inlinable into `comprehensions.onSpark` blocks from
  * ANY file: the annotation macro re-renders the def's source and stores
  * it in a pickled [[graftSrc]] annotation; the comprehension macro
  * parses it at the splice site, qualifies references to sibling members
  * of the enclosing object, and beta-reduces with the same cycle check /
  * alpha-rename / shadow discipline as same-file helpers.
  *
  * Constraints (enforced at the splice site, with guidance):
  *   - the def must be a member of a top-level (or nested-in-objects)
  *     `object`;
  *   - free references in the body must be parameters, body-locals,
  *     sibling members of the enclosing object, or names from the
  *     default scala/java/Predef universe — file-local imports do not
  *     travel with the source (fully qualify them inside the body);
  *   - no type parameters, no recursion (same rules as same-file
  *     helpers).
  *
  * Requires `-Ymacro-annotations`. */
class lib extends StaticAnnotation {
  def macroTransform(annottees: Any*): Any = macro libMacro.impl
}

object libMacro {
  def impl(c: whitebox.Context)(annottees: c.Tree*): c.Tree = {
    import c.universe._
    annottees.toList match {
      case (dd: DefDef) :: Nil =>
        if (dd.rhs.isEmpty)
          c.abort(c.enclosingPosition, "@lib requires a def with a concrete body")
        val src = showCode(dd)
        // re-parse NOW so a body that does not round-trip through
        // showCode/parse fails loudly at the DEFINITION site, not at a
        // distant splice site
        val reparsed =
          try c.parse(src)
          catch { case e: Throwable =>
            c.abort(c.enclosingPosition,
              s"@lib: def does not round-trip through showCode/parse " +
              s"(${e.getMessage}) — simplify the body or inline manually")
          }
        reparsed match {
          case _: DefDef => ()
          case _ => c.abort(c.enclosingPosition,
            "@lib: rendered source did not parse back to a single def")
        }
        // capture the defining unit's import statements (any scope level —
        // over-approximate; the splice-site resolver only consults them for
        // names it cannot otherwise bind) so file-local imports the body
        // relies on can be re-qualified at a foreign splice site
        val importSrcs = scala.collection.mutable.ListBuffer.empty[String]
        c.enclosingUnit.body.foreach {
          case imp: Import => importSrcs += showCode(imp)
          case _ => ()
        }
        val ann = q"new _root_.graft.api.graftSrc($src, ${importSrcs.mkString("\n")})"
        val newMods = Modifiers(dd.mods.flags, dd.mods.privateWithin,
          ann :: dd.mods.annotations)
        treeCopy.DefDef(dd, newMods, dd.name, dd.tparams, dd.vparamss,
          dd.tpt, dd.rhs)
      case _ =>
        c.abort(c.enclosingPosition,
          "@lib supports only a single concrete `def` (no vals, classes, or objects)")
    }
  }
}
