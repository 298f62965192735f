package graft.shex

import scala.collection.mutable.ListBuffer

import graft.model.{Term, Triple}
import graft.shex.ShexAst.SemAct

/**
 * The shexTest "Test" semantic-action extension
 * (http://shex.io/extensions/Test/ — reference: jena-shex
 * semact/TestSemanticActionPlugin.java). Code is `print(arg, …)` or
 * `fail(arg, …)` where each arg is a quoted string (kept quoted, with
 * backslash escapes removed) or one of `s`/`p`/`o` naming a component of
 * the dispatching triple (the focus node for shape-level actions).
 * `fail` emits its output and then fails the surrounding match.
 */
final class TestSemActs extends ShexValidator.SemActHandler {
  val out = ListBuffer[String]()

  val uris: Set[String] = Set("http://shex.io/extensions/Test/")

  private val call = """^\s*(fail|print)\s*\((.*)\)\s*$""".r

  private def args(argStr: String): List[String] = {
    val parts = ListBuffer[String]()
    var rest = argStr.trim
    while (rest.nonEmpty) {
      if (rest.startsWith("\"")) {
        // find the closing unescaped quote
        var k = 1
        while (k < rest.length && !(rest.charAt(k) == '"' && rest.charAt(k - 1) != '\\')) k += 1
        if (k >= rest.length) throw new ShexAst.ShexException(s"bad Test arg: $argStr")
        parts += rest.substring(0, k + 1)
        rest = rest.substring(k + 1).trim.stripPrefix(",").trim
      } else {
        val k = rest.indexOf(',')
        if (k < 0) { parts += rest.trim; rest = "" }
        else { parts += rest.substring(0, k).trim; rest = rest.substring(k + 1).trim }
      }
    }
    parts.toList
  }

  private def renderTerm(t: Term): String =
    if (t.isIri) t.lex
    else if (t.isBNode) t.lex
    else t.toNTriples

  private def eval(act: SemAct, resolve: String => String): Boolean = {
    val code = act.code.getOrElse(
      throw new ShexAst.ShexException("Test semantic action requires code"))
    code match {
      case call(fn, argStr) =>
        val rendered = args(argStr).map {
          case a if a.startsWith("\"") => a.replaceAll("\\\\(.)", "$1")
          case v => resolve(v)
        }
        out += rendered.mkString(", ")
        fn != "fail"
      case _ =>
        throw new ShexAst.ShexException(s"Test semantic action did not parse: $code")
    }
  }

  def evalStart(act: SemAct): Boolean =
    eval(act, v => throw new ShexAst.ShexException(s"start action var $v"))

  def evalShapeExpr(act: SemAct, focus: Term): Boolean =
    eval(act, {
      case "s" => renderTerm(focus)
      case v => throw new ShexAst.ShexException(s"shape action var $v")
    })

  def evalTripleExpr(act: SemAct, triples: Seq[Triple]): Boolean = {
    val t = triples.headOption
    eval(act, v => t match {
      case None => null
      case Some(tr) => v match {
        case "s" => renderTerm(tr.s)
        case "p" => renderTerm(tr.p)
        case "o" => renderTerm(tr.o)
        case other => throw new ShexAst.ShexException(s"triple action var $other")
      }
    })
  }
}
