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
  * Also accepted on a whole `object` (the reference's documented
  * spelling: `@emma.lib object stat`, emma-lib/.../lib/stats/stat.scala:22
  * — every emma-lib module ships that way): EVERY public concrete `def`
  * member gets the carrier (vals, inner objects, and private members are
  * left untouched). Which members actually inline is decided at the
  * splice site: bag-RETURNING defs (join derivation) and scalar defs that
  * CONSUME DataBag parameters (the reference's stat.mean shape — their
  * folds then hoist/fuse); other scalar members keep an inert carrier and
  * stay ordinary static calls.
  *
  * Constraints (enforced at the splice site, with guidance):
  *   - the def must be a member of a top-level (or nested-in-objects)
  *     `object`;
  *   - free references in the body must be parameters, body-locals,
  *     sibling members of the enclosing object, names covered by imports
  *     IN SCOPE at the def (captured and re-qualified), or names from the
  *     default scala/java/Predef universe — anything else must be fully
  *     qualified inside the body;
  *   - type-parameterized defs inline when the call site's concrete type
  *     arguments are recoverable (typed generator calls always; untyped
  *     guard/yield or nested calls need them written explicitly);
  *     higher-kinded type parameters and recursion abort (same rules as
  *     same-file helpers).
  *
  * Requires `-Ymacro-annotations`. */
class lib extends StaticAnnotation {
  def macroTransform(annottees: Any*): Any = macro libMacro.impl
}

object libMacro {
  def impl(c: whitebox.Context)(annottees: c.Tree*): c.Tree = {
    import c.universe._

    /** Imports IN SCOPE at `target` inside the enclosing unit: only those
      * on the scope chain from the unit root to the tree, positioned
      * BEFORE it. The previous capture (every Import anywhere in the
      * unit) let a sibling-scope `import A.foo` outrank a package-level
      * `foo` the def actually binds — a silent mis-binding at a foreign
      * splice site. Scope chains are packages / objects / classes only
      * (an @lib def is a static-object member; method-local defs abort at
      * the splice site anyway). Returns None when the target cannot be
      * located in the unit — the caller then captures NO imports, so an
      * import-dependent free name aborts at the splice site with
      * fully-qualify guidance instead of guessing. */
    def enclosingImports(target: Tree): Option[List[Import]] = {
      def scopeStats(t: Tree): List[Tree] = t match {
        case PackageDef(_, stats) => stats
        case ModuleDef(_, _, Template(_, _, body)) => body
        case ClassDef(_, _, _, Template(_, _, body)) => body
        case _ => Nil
      }
      def isTarget(s: Tree): Boolean = (s eq target) || ((s, target) match {
        case (a: DefDef, b: DefDef) => a.name == b.name && a.pos == b.pos
        case (a: ModuleDef, b: ModuleDef) => a.name == b.name && a.pos == b.pos
        case _ => false
      })
      def walk(scope: Tree, acc: List[Import]): Option[List[Import]] = {
        var imps = acc
        for (s <- scopeStats(scope)) {
          if (isTarget(s)) return Some(imps)
          s match {
            case i: Import => imps = imps :+ i
            case _ =>
              walk(s, imps) match {
                case found @ Some(_) => return found
                case None => ()
              }
          }
        }
        None
      }
      walk(c.enclosingUnit.body, Nil)
    }

    /** Attach the @graftSrc carrier (re-rendered source + in-scope
      * imports) to one def. `where` names the context for error text. */
    def addCarrier(dd: DefDef, where: String): DefDef = {
      if (dd.rhs.isEmpty)
        c.abort(dd.pos, s"@lib requires a concrete body$where")
      val src = showCode(dd)
      // re-parse NOW so a body that does not round-trip through
      // showCode/parse fails loudly at the DEFINITION site, not at a
      // distant splice site
      val reparsed =
        try c.parse(src)
        catch { case e: Throwable =>
          c.abort(dd.pos,
            s"@lib: def '${dd.name}'$where does not round-trip through " +
            s"showCode/parse (${e.getMessage}) — simplify the body or inline manually")
        }
      reparsed match {
        case _: DefDef => ()
        case _ => c.abort(dd.pos,
          s"@lib: rendered source of '${dd.name}'$where did not parse back to a single def")
      }
      val importSrcs = enclosingImports(dd)
        .getOrElse(Nil).map(i => showCode(i))
      val ann = q"new _root_.graft.api.graftSrc($src, ${importSrcs.mkString("\n")})"
      val newMods = Modifiers(dd.mods.flags, dd.mods.privateWithin,
        ann :: dd.mods.annotations)
      treeCopy.DefDef(dd, newMods, dd.name, dd.tparams, dd.vparamss,
        dd.tpt, dd.rhs)
    }

    annottees.toList match {
      case (dd: DefDef) :: Nil =>
        addCarrier(dd, "")
      case (md @ ModuleDef(mods, name, Template(parents, self, body))) :: rest =>
        // object-level spelling: carrier on EVERY public concrete def —
        // the reference's @emma.lib instruments every member the same way
        // (compiler/lib/Lib.scala:49-51 matches any carrier-bearing
        // DefCall), and since r14 the splice site also inlines SCALAR
        // members that consume DataBag parameters (stat.mean-shaped bag
        // consumers, emma-lib/.../stats/stat.scala:27-35); members that
        // are neither bag-returning nor bag-consuming keep their carrier
        // inert (the splice-site spliceableLib gate skips them). The old
        // declared-result-type substring test also silently skipped
        // members declaring their bag result through a type alias.
        def eligible(d: DefDef): Boolean =
          d.rhs.nonEmpty &&
          d.name != termNames.CONSTRUCTOR &&
          !d.mods.hasFlag(Flag.PRIVATE) && !d.mods.hasFlag(Flag.PROTECTED) &&
          !d.mods.hasFlag(Flag.SYNTHETIC) &&
          d.mods.privateWithin == typeNames.EMPTY
        val newBody = body.map {
          case d: DefDef if eligible(d) => addCarrier(d, s" in @lib object $name")
          case other => other
        }
        val newMd = treeCopy.ModuleDef(md, mods, name,
          treeCopy.Template(md.impl, parents, self, newBody))
        rest match {
          case Nil => newMd
          case more => Block(newMd :: more, Literal(Constant(())))
        }
      case _ =>
        c.abort(c.enclosingPosition,
          "@lib supports a single concrete `def` or a whole `object` " +
          "(no vals or classes)")
    }
  }
}
