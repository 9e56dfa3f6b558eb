package graft.expr

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}

/** Real `doGenCode` for the native single-pass text expressions, replacing
  * `CodegenFallback`.
  *
  * Why not CodegenFallback: `CollapseCodegenStages` excludes a whole
  * `ProjectExec` from WholeStageCodegen if ANY expression in it is a
  * `CodegenFallback` — one fallback signal struct in a projection knocks the
  * entire stage (scan + all sibling codegen'd expressions) back to the
  * interpreted Volcano path. The kernels themselves are tight imperative
  * Java-collection loops that gain nothing from being emitted as Java source,
  * so the right shape is: keep the kernel as a compiled method, and generate
  * a direct call to it on the child's already-unboxed generated value. The
  * stage stays inside WholeStageCodegen (PlanSpec asserts this), the child
  * value flows in without an `InternalRow` detour (CodegenFallback routes
  * through `expr.eval(INPUT_ROW)`), and null handling is the standard
  * generated null-check.
  */
private[expr] trait NativeKernelCodegen { self: UnaryExpression =>

  /** The interpreted kernel; input is the child's non-null Catalyst value
    * (e.g. `UTF8String`), result the Catalyst value of [[dataType]]. Public
    * only so generated code can call it.
    */
  def kernel(input: Any): Any

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, this.getClass.getName)
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = (${CodeGenerator.boxedType(dataType)}) $ref.kernel($c);"
    )
  }
}
